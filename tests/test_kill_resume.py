"""Resume-after-kill (north rule / SURVEY §5c): SIGKILL a flagship run
mid-write, restart it, and verify completed partitions are skipped and the
final output is identical to an uninterrupted run."""

import glob
import os
import signal
import subprocess
import sys
import time

import pyarrow.dataset as pads
import pytest

_SCRIPT = """
import sys
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, {repo!r})
from geo_epic_ray.pipelines.flagship import run_flagship, synthetic_documents
report = run_flagship(
    synthetic_documents(30000), {out!r},
    input_fingerprint="kill-test", skew=True, target_rows=2000,
)
print("DONE", report.rows.sum(), report.skipped.sum())
ray.shutdown()
"""


def _run(out, kill_after_partitions=None, timeout=240):
    env = dict(os.environ)
    proc = subprocess.Popen(
        [sys.executable, "-c", _SCRIPT.format(repo="/root/repo", out=out)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True, env=env,
        start_new_session=True,  # own process group: kill wipes its raylet too
    )
    if kill_after_partitions is None:
        out_text, _ = proc.communicate(timeout=timeout)
        assert "DONE" in out_text, out_text
        return out_text
    # wait until some partitions have completed, then SIGKILL the driver
    deadline = time.time() + timeout
    manifest = os.path.join(out, "_manifest")
    while time.time() < deadline:
        done = len(glob.glob(os.path.join(manifest, "part-*.json")))
        if done >= kill_after_partitions:
            break
        if proc.poll() is not None:
            break  # finished before we could kill — test still meaningful
        time.sleep(0.05)
    if proc.poll() is None:
        os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
        proc.wait(timeout=30)
        time.sleep(2)
    return None


def test_kill_mid_run_then_resume_produces_identical_output(tmp_path):
    killed_out = str(tmp_path / "killed")
    clean_out = str(tmp_path / "clean")
    os.makedirs(killed_out)
    os.makedirs(clean_out)

    _run(killed_out, kill_after_partitions=2)
    done_before = len(glob.glob(f"{killed_out}/_manifest/part-*.json"))

    # resume: completed partitions must be skipped, run must finish
    out_text = _run(killed_out)
    assert "DONE 30000" in out_text
    if done_before > 0:
        skipped = int(float(out_text.split()[-1]))
        assert skipped >= done_before - 1  # all pre-kill partitions reused

    # uninterrupted baseline
    _run(clean_out)

    def load(d):
        return (
            pads.dataset(glob.glob(f"{d}/part=*/data.parquet"))
            .to_table()
            .sort_by([("doc_id", "ascending")])
        )

    a, b = load(killed_out), load(clean_out)
    assert a.num_rows == b.num_rows == 30000
    assert a.sort_by("doc_id").equals(b.sort_by("doc_id"))
