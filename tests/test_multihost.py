"""Two-process multihost smoke test (VERDICT r1 #9).

Launches two REAL Python processes that ``jax.distributed.initialize``
against a localhost coordinator (the DCN control plane the pod-slice path
uses), build the global 2-device CPU mesh, run a psum and a sharded
BA-GMRES solve across processes, and check parity with a single-process
run.  Exercises ``initialize_multihost`` beyond the single-host no-op,
including its error path.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest


_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("XLA_FLAGS", None)   # exactly one local device per process
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from hybrid_gmres_tpu.parallel import initialize_multihost

    port = sys.argv[1]
    pid = int(sys.argv[2])
    ok = initialize_multihost(coordinator_address=f"127.0.0.1:{port}",
                              num_processes=2, process_id=pid)
    assert ok is True
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 2, jax.devices()

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from hybrid_gmres_tpu.parallel import make_mesh, shard_problem
    from hybrid_gmres_tpu.parallel import ba_gmres_sharded_basis
    from hybrid_gmres_tpu.parallel.multihost import local_shard_info

    mesh = make_mesh(2)
    info = local_shard_info(mesh)
    assert info["process_count"] == 2
    assert info["process_index"] == pid

    # cross-process psum
    out = jax.shard_map(
        lambda x: jax.lax.psum(x, "rows"), mesh=mesh,
        in_specs=P("rows"), out_specs=P(), check_vma=False,
    )(jnp.arange(4, dtype=jnp.float64))
    # process 0 holds [0,1], process 1 holds [2,3]; elementwise psum
    np.testing.assert_allclose(np.asarray(out), [0.0 + 2.0, 1.0 + 3.0])

    # cross-process sharded solve == the precomputed single-process result
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((8, 4)) * 0.1 + np.eye(8, 4))
    x_true = jnp.asarray(rng.standard_normal(4))
    b = A @ x_true
    A_s, B_s, b_s = shard_problem(A, A.T, b, mesh)
    r = ba_gmres_sharded_basis(A_s, B_s, b_s, x_true, tol=1e-12, maxit=4,
                               lam=1e-3, mesh=mesh)
    err = np.asarray(jax.device_get(r.err_hist))
    expect = np.asarray([float(t) for t in sys.argv[3].split(",")])
    np.testing.assert_allclose(err, expect, rtol=1e-9)

    # the production sharded-Pallas panel path across the two processes:
    # every panel leaf is device_put to its global (leading-axis) sharding
    import scipy.sparse as sp
    from jax.sharding import NamedSharding
    from hybrid_gmres_tpu.parallel import (ba_gmres_sharded_pallas,
                                           shard_bucketed_panels)

    A_np = np.asarray(A)
    def _place(tree):
        def put(a):
            spec = P(*(("rows",) + (None,) * (a.ndim - 1)))
            return jax.device_put(a, NamedSharding(mesh, spec))
        return jax.tree_util.tree_map(put, tree)

    A_p = _place(shard_bucketed_panels(sp.csr_matrix(A_np), 2))
    BT_p = _place(shard_bucketed_panels(sp.csr_matrix(A_np), 2))  # B=A^T
    b_g = jax.device_put(np.asarray(b), NamedSharding(mesh, P("rows")))
    xt_g = jax.device_put(np.asarray(x_true),
                          NamedSharding(mesh, P("rows")))
    r2 = ba_gmres_sharded_pallas(A_p, BT_p, b_g, xt_g, tol=1e-12, maxit=4,
                                 lam=1e-3, mesh=mesh, interpret=True)
    err2 = np.asarray(jax.device_get(r2.err_hist))
    expect2 = np.asarray([float(t) for t in sys.argv[4].split(",")])
    np.testing.assert_allclose(err2, expect2, rtol=1e-6)
    print(f"WORKER{pid} OK")
""")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_psum_and_solve():
    import numpy as np
    import scipy.sparse as sp
    import jax.numpy as jnp
    from hybrid_gmres_tpu.parallel import make_mesh, shard_problem
    from hybrid_gmres_tpu.parallel import (ba_gmres_sharded_basis,
                                           ba_gmres_sharded_pallas,
                                           shard_bucketed_panels)

    # single-process expected histories on a 2-device mesh
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((8, 4)) * 0.1 + np.eye(8, 4))
    x_true = jnp.asarray(rng.standard_normal(4))
    b = A @ x_true
    mesh = make_mesh(2)
    A_s, B_s, b_s = shard_problem(A, A.T, b, mesh)
    r = ba_gmres_sharded_basis(A_s, B_s, b_s, x_true, tol=1e-12, maxit=4,
                               lam=1e-3, mesh=mesh)
    expect = ",".join(repr(float(v)) for v in np.asarray(r.err_hist))
    A_p = shard_bucketed_panels(sp.csr_matrix(np.asarray(A)), 2)
    BT_p = shard_bucketed_panels(sp.csr_matrix(np.asarray(A)), 2)
    r2 = ba_gmres_sharded_pallas(A_p, BT_p, b, x_true, tol=1e-12, maxit=4,
                                 lam=1e-3, mesh=mesh, interpret=True)
    expect2 = ",".join(repr(float(v)) for v in np.asarray(r2.err_hist))

    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(port), str(pid), expect,
             expect2],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER{pid} OK" in out


def test_initialize_multihost_error_path():
    """A requested-but-broken multihost config must raise, not silently run
    single-host (partial results)."""
    code = textwrap.dedent("""
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        from hybrid_gmres_tpu.parallel import initialize_multihost
        try:
            initialize_multihost(coordinator_address="127.0.0.1:1",
                                 num_processes=2, process_id=1,
                                 initialization_timeout=5)
        except Exception:
            print("RAISED")
        else:
            print("DID-NOT-RAISE")
    """)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env=env, timeout=120)
    # Depending on the jax version the failed handshake either raises a
    # Python exception or hard-aborts the process with an absl fatal log;
    # both surface the failure — what must NOT happen is a clean exit
    # silently continuing single-host.
    raised = "RAISED" in out.stdout
    aborted = out.returncode != 0 and ("DEADLINE" in out.stderr
                                       or "Terminating process" in out.stderr)
    assert raised or aborted, (out.returncode, out.stdout, out.stderr)
    assert "DID-NOT-RAISE" not in out.stdout


_WORKER_2D = textwrap.dedent("""
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("XLA_FLAGS", None)   # exactly one local device per process
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from hybrid_gmres_tpu.parallel import initialize_multihost

    port = sys.argv[1]
    pid = int(sys.argv[2])
    ok = initialize_multihost(coordinator_address=f"127.0.0.1:{port}",
                              num_processes=2, process_id=pid)
    assert ok is True

    import numpy as np
    import scipy.sparse as sp
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from hybrid_gmres_tpu.parallel import (
        ba_gmres_sharded_pallas_2d, hybrid_lsmr_sharded_2d, make_mesh_2d,
        tile_bucketed_panels)

    # (2, 1) process mesh: the row axis crosses the process boundary
    mesh2 = make_mesh_2d((2, 1))

    rng = np.random.default_rng(0)
    A = (rng.standard_normal((8, 4)) * 0.1 + np.eye(8, 4))
    x_true = rng.standard_normal(4)
    b = A @ x_true

    def _place(tree):
        def put(a):
            spec = P(*((("rows", "cols"),) + (None,) * (a.ndim - 1)))
            return jax.device_put(a, NamedSharding(mesh2, spec))
        return jax.tree_util.tree_map(put, tree)

    A_t = _place(tile_bucketed_panels(sp.csr_matrix(A), 2, 1))
    BT_t = _place(tile_bucketed_panels(sp.csr_matrix(A), 2, 1))  # B=A^T
    b_g = jax.device_put(b, NamedSharding(mesh2, P("rows")))
    xt_g = jax.device_put(x_true, NamedSharding(mesh2, P("cols")))

    r = ba_gmres_sharded_pallas_2d(A_t, BT_t, b_g, xt_g, tol=1e-12,
                                   maxit=4, lam=1e-3, mesh=mesh2,
                                   interpret=True)
    err = np.asarray(jax.device_get(r.err_hist))
    expect = np.asarray([float(t) for t in sys.argv[3].split(",")])
    np.testing.assert_allclose(err, expect, rtol=1e-6)

    r2 = hybrid_lsmr_sharded_2d(A_t, b_g, xt_g, tol=1e-12, maxit=4,
                                lam=1e-3, mesh=mesh2, interpret=True)
    err2 = np.asarray(jax.device_get(r2.err_hist))
    expect2 = np.asarray([float(t) for t in sys.argv[4].split(",")])
    np.testing.assert_allclose(err2, expect2, rtol=1e-6)
    print(f"WORKER{pid} OK")
""")


def test_two_process_2d_tiled_tier():
    """The 2-D tiled tier (VERDICT r3 #6) across a REAL process boundary:
    a (2,1) mesh with one device per process drives the tiled-panel
    GMRES and the 2-D GKB hybrid, parity-checked against the
    single-process run of the same mesh shape."""
    import numpy as np
    import scipy.sparse as sp
    import jax.numpy as jnp
    from hybrid_gmres_tpu.parallel import (
        ba_gmres_sharded_pallas_2d, hybrid_lsmr_sharded_2d, make_mesh_2d,
        tile_bucketed_panels)

    rng = np.random.default_rng(0)
    A = (rng.standard_normal((8, 4)) * 0.1 + np.eye(8, 4))
    x_true = rng.standard_normal(4)
    b = A @ x_true
    mesh2 = make_mesh_2d((2, 1))
    A_t = tile_bucketed_panels(sp.csr_matrix(A), 2, 1)
    BT_t = tile_bucketed_panels(sp.csr_matrix(A), 2, 1)
    r = ba_gmres_sharded_pallas_2d(A_t, BT_t, jnp.asarray(b),
                                   jnp.asarray(x_true), tol=1e-12, maxit=4,
                                   lam=1e-3, mesh=mesh2, interpret=True)
    expect = ",".join(repr(float(v)) for v in np.asarray(r.err_hist))
    r2 = hybrid_lsmr_sharded_2d(A_t, jnp.asarray(b), jnp.asarray(x_true),
                                tol=1e-12, maxit=4, lam=1e-3, mesh=mesh2,
                                interpret=True)
    expect2 = ",".join(repr(float(v)) for v in np.asarray(r2.err_hist))

    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER_2D, str(port), str(pid), expect,
             expect2],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("2-D multihost workers timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER{pid} OK" in out
