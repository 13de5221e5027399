"""2-process jax.distributed CPU smoke test (SURVEY.md §4.2, VERDICT r1 §6d).

Exercises the only code path that never runs single-process: the DCN
metadata exchange (``collectives.process_sum_histogram`` /
``mesh.multihost_init``) that ``pipelines.serve.Server.plan`` uses on a pod.
Two local processes initialize a jax.distributed cluster over localhost,
exchange per-host bucket histograms, and must derive the IDENTICAL global
bucket plan.
"""
import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    import numpy as np
    pid = int(sys.argv[1])
    # multihost_init reads JAX_COORDINATOR (set by the test env)
    from styletts_zs_tpu.parallel import mesh as mesh_lib
    ok = mesh_lib.multihost_init(num_processes=2, process_id=pid)
    assert ok, "multihost_init returned False despite JAX_COORDINATOR"
    import jax
    assert jax.process_count() == 2, jax.process_count()

    from styletts_zs_tpu.parallel import bucketing, collectives
    # per-host request lengths differ; the plan must not
    lengths = np.asarray([100, 300] if pid == 0 else [120, 600, 900])
    buckets = (256, 512, 1024)
    local = bucketing.bucket_histogram(lengths, buckets)
    global_hist = collectives.process_sum_histogram(local)
    plan = bucketing.plan_buckets(global_hist, batch_size=2, buckets=buckets)
    print("HIST", global_hist.tolist(), flush=True)
    print("PLAN", sorted(plan.batches_per_bucket.items()), flush=True)
""")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_histogram_exchange(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()
    env = dict(os.environ)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",          # never touch the TPU tunnel
        "JAX_COORDINATOR": f"127.0.0.1:{port}",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        "PYTHONPATH": repo_root + os.pathsep + env.get("PYTHONPATH", ""),
    })
    procs = [subprocess.Popen([sys.executable, str(worker), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, env=env, text=True,
                              cwd=os.path.dirname(os.path.dirname(__file__)))
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=150)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("2-process exchange timed out")
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append([ln for ln in out.splitlines()
                     if ln.startswith(("HIST", "PLAN"))])
    # both hosts saw the summed histogram and derived the identical plan
    assert outs[0] == outs[1], outs
    assert outs[0][0] == "HIST [2, 1, 2]", outs[0]
