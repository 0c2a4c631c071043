"""Bench-scale checkpoint/resume exercise (VERDICT r02 item #9):
sf0.1 docs, 32 CPUs. Measures (1) clean run, (2) a REAL mid-run
SIGKILL — the driver subprocess is killed as soon as its 2nd fragment
manifest appears (ADVICE r3: no post-hoc deletion; partial parquet
files / torn state from the in-flight 3rd fragment are left exactly as
the crash leaves them) — followed by the resumed run, (3) idempotent
full re-run, and checks output digests across all three are identical."""
import glob
import hashlib
import json
import os
import shutil
import signal
import subprocess
import sys
import time

DOCS = "/tmp/raycells_docs/sf0.1"


def _cmd(out):
    return [sys.executable, "-m", "raycells.engine.driver",
            "--docs-dir", DOCS, "--out", out, "--num-cpus", "32"]


def run(out):
    t0 = time.time()
    p = subprocess.run(_cmd(out), capture_output=True, text=True, cwd="/root/repo")
    wall = time.time() - t0
    line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else "{}"
    return wall, json.loads(line) if line.startswith("{") else {"rc": p.returncode}


def run_until_killed(out, kill_after_manifests: int, timeout: float = 600.0):
    """Launch the driver and SIGKILL it the moment ``kill_after_manifests``
    manifest files exist — a genuine crash mid-fragment-3, not a
    simulated one. Returns the number of manifests present at kill."""
    p = subprocess.Popen(_cmd(out), stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL, cwd="/root/repo")
    deadline = time.time() + timeout
    try:
        while time.time() < deadline:
            n = len(glob.glob(os.path.join(out, "manifest", "*.json")))
            if n >= kill_after_manifests:
                p.send_signal(signal.SIGKILL)
                break
            if p.poll() is not None:  # finished before the kill point
                break
            time.sleep(0.05)
        else:
            p.send_signal(signal.SIGKILL)
    finally:
        p.wait()
    return len(glob.glob(os.path.join(out, "manifest", "*.json")))


def digest(out):
    h = hashlib.sha256()
    import duckdb
    con = duckdb.connect()
    for frag in sorted(glob.glob(os.path.join(out, "fragment=*"))):
        df = con.execute(
            f"SELECT * FROM read_parquet('{frag}/*.parquet') ORDER BY cell_id").fetchdf()
        h.update(df.to_csv(index=False).encode())
    return h.hexdigest()


A, B = "/tmp/raycells_out/resume_a", "/tmp/raycells_out/resume_b"
shutil.rmtree(A, ignore_errors=True); shutil.rmtree(B, ignore_errors=True)
w_clean, s = run(A)
print(f"clean: {w_clean:.1f}s done={len(s['done'])} skipped={len(s['skipped'])}")

n_at_kill = run_until_killed(B, kill_after_manifests=2)
print(f"SIGKILLed driver with {n_at_kill} manifests published")
assert n_at_kill < 4, "driver finished before the kill point"

w_resume, s = run(B)
print(f"resume after SIGKILL@{n_at_kill}/4: {w_resume:.1f}s "
      f"done={len(s['done'])} skipped={len(s['skipped'])}")
assert len(s["skipped"]) == n_at_kill and len(s["done"]) == 4 - n_at_kill, s

w_noop, s = run(B)
print(f"idempotent re-run: {w_noop:.1f}s done={len(s['done'])} skipped={len(s['skipped'])}")
assert len(s["skipped"]) == 4 and len(s["done"]) == 0, s

da, db = digest(A), digest(B)
print("digest equal:", da == db, da[:16])
print(json.dumps({"clean_s": round(w_clean, 1), "resume_s": round(w_resume, 1),
                  "noop_s": round(w_noop, 1), "killed_at": n_at_kill,
                  "digest_equal": da == db}))
