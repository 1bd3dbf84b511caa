"""True multi-PROCESS pipeline test: 2 jax processes x 4 virtual CPU
devices run one full generation (self-play -> train -> evaluate -> gate)
against a shared workdir, exercising the cross-process collectives the
reference solved with master/slave RPC + scp (master_coordinator.py,
scpy.py).  The in-process 8-device mesh tests elsewhere cannot catch
process-boundary bugs (make_array_from_process_local_data, allgathered
promotion, process-0 checkpoint barriers) — this one does.
"""
import os
import socket
import subprocess
import sys

def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_generation(workdir):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_mh_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), str(workdir)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=840)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    ok = all(p.returncode == 0 and "MH_OK" in out
             for p, out in zip(procs, outs))
    return ok, procs, outs


def test_two_process_pipeline_generation(tmp_path):
    # one retry on a fresh port/workdir: the distributed bootstrap +
    # barriers are wall-clock-sensitive and flake when the machine is
    # heavily loaded (e.g. the suite sharing the host with a TPU bench);
    # a real regression fails both attempts
    workdir = tmp_path / "try1"
    ok, procs, outs = _run_generation(workdir)
    if not ok:
        workdir = tmp_path / "try2"
        ok, procs, outs = _run_generation(workdir)
    tmp_path = workdir  # assert against the attempt that actually ran
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"
        assert "MH_OK" in out, out[-4000:]
    # both processes reached the same promotion decision
    lines = [next(ln for ln in out.splitlines() if ln.startswith("MH_OK"))
             for out in outs]
    assert lines[0].split("promote=")[1] == lines[1].split("promote=")[1]
    assert lines[0].split("best=")[1] == lines[1].split("best=")[1]
    # shared store has the trained generation
    assert (tmp_path / "sp_models" / "model_2.msgpack").exists() or any(
        (tmp_path / "sp_models").glob("model_2*"))
