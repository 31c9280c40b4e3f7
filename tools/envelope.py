#!/usr/bin/env python3
"""Scripted per-round cross-engine stress envelope.

Builds an N-times referential-integrity-preserving copy of an SF dir
(stress5x machinery), runs graft.Verify over it (direct java -cp, no
sbt lock), DuckDB-compares every oracle query (compare_local logic),
and emits ENVELOPE_r<round>.json — the judge-readable artifact the
round-7 ad-hoc 5x heroic lacked.

Usage:
  python3 tools/envelope.py <round> [sf_dir] [copies] [workdir] \
      [only_regex] [--detwin]
  python3 tools/envelope.py 8                      # 5x of sf0.1
  python3 tools/envelope.py 8 /root/testdata/sf0.1 5 /tmp/env_r8
  python3 tools/envelope.py 9 /root/testdata/sf0.1 25 /tmp/env25 \
      'embed_.*|str_fuzzy.*|doc_winnow.*' --detwin

--detwin builds the copies through tools/detwin.py (content-perturbed
copies so pair-generating output can't explode quadratically by twin
construction), restricts Verify + compare to `only_regex`, and ALSO
times the matching queries via graft.Bench at 1x and at Nx, recording
per-query time ratios (the sub-quadratic-growth evidence).

Run from the repo root AFTER `sbt compile` (uses
target/scala-2.13/classes). Writes ENVELOPE_r<round>[_detwin<N>x].json
in the repo root: per-query pass/fail plus counts; exit code 1 if
anything fails.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import compare_local
import detwin
import stress5x

# Gates whose INPUT is deliberately capped to a fixed id range for
# oracle feasibility or compare-volume reasons (see SCALING.md
# "Fixed-input gates"): at any stress multiple these process the same
# rows after a scan-and-discard filter, so their time_ratio entries
# measure the scan, NOT the operator — the artifact tags them so a
# ratio can never be misread as scale evidence (the round-12 verdict's
# doc_substring_dups finding; that gate now scales via doc_id % 10M).
FIXED_INPUT = {
    "doc_jaccard_pairs": "doc_id < 150; exact all-pairs oracle is O(n^2)",
    "doc_containment_pairs": "doc_id < 150; exact all-pairs oracle is O(n^2)",
    "doc_minhash_pairs": "doc_id < 1000; oracle unrolls band joins",
    "doc_minhash_ngram_pairs": "doc_id < 1000; oracle unrolls band joins",
    "doc_simhash_pairs": "doc_id < 1000; pigeonhole oracle is O(n^2)",
    "corpus_leakage_report": "doc_id < 1000; minhash-pair oracle",
    "doc_neardup_clusters": "doc_id < 150; recursive-CTE closure oracle",
    "doc_dedup_delta_near": "base < 250, delta 250..400; O(base*delta) oracle",
    "doc_sentences": "doc_id < 50; per-sentence compare volume",
    "doc_bm25": "doc_id < 100; per-(doc,term) compare volume",
    "doc_tfidf": "doc_id < 100; per-(doc,term) compare volume",
    "doc_strip_html": "doc_id < 200; full-text compare volume",
}

ADD_OPENS = [
    f"--add-opens=java.base/{p}=ALL-UNNAMED" for p in [
        "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
        "java.net", "java.nio", "java.util", "java.util.concurrent",
        "java.util.concurrent.atomic", "jdk.internal.ref", "sun.nio.ch",
        "sun.nio.cs", "sun.security.action", "sun.util.calendar"]]


def _bench(repo, cp, sf_dir, only, outdir):
    """Run graft.Bench restricted to `only`, cwd=outdir (Bench writes
    bench.json in its cwd); return the per-query seconds map."""
    os.makedirs(outdir, exist_ok=True)
    env = dict(os.environ, SPARK_GRAFT_CPUS="16", SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_ONLY=only)
    rc = subprocess.call(
        ["java", "-Xmx48g"] + ADD_OPENS + ["-cp", cp, "graft.Bench"],
        cwd=outdir, env=env, stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL)
    if rc != 0:
        print(f"Bench exited {rc}", file=sys.stderr)
        return {}
    # scoped runs (SPARK_GRAFT_ONLY set) write bench_scoped.json so they
    # can never clobber a repo-root bench.json; keep the old name as a
    # fallback for pre-change class builds
    for name in ("bench_scoped.json", "bench.json"):
        p = os.path.join(outdir, name)
        if os.path.exists(p):
            return json.load(open(p))["queries"]
    print("no bench output found", file=sys.stderr)
    return {}


def main(rnd, sf_dir="/root/testdata/sf0.1", copies=5, workdir=None,
         only=None, use_detwin=False, with_times=False):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    workdir = workdir or f"/tmp/envelope_r{rnd}"
    stress_dir = os.path.join(workdir, f"sf_x{copies}")
    vout = os.path.join(workdir, "vout")
    os.makedirs(stress_dir, exist_ok=True)

    t0 = time.time()
    kind = "de-twinned" if use_detwin else "twin"
    # a completed copy is immutable — reuse it across rounds (the marker
    # is written only after build() returns, so half-builds never match)
    marker = os.path.join(stress_dir, f"_GRAFT_{kind.replace('-', '')}_OK")
    if os.path.exists(marker):
        print(f"== reusing existing {copies}x {kind} copy at {stress_dir}")
    else:
        print(f"== building {copies}x {kind} copy of {sf_dir} -> {stress_dir}")
        (detwin if use_detwin else stress5x).build(sf_dir, stress_dir, copies)
        open(marker, "w").close()

    # GRAFT_CLASSES: snapshot dir override so `sbt compile` can keep
    # running while a long envelope pass reads a frozen class tree.
    classes = os.environ.get("GRAFT_CLASSES",
                             f"{repo}/target/scala-2.13/classes")
    cp = f"/opt/spark/jars/*:{classes}"
    # GRAFT_ENVELOPE_RESUME=1: reuse an existing COMPLETE Verify dump in
    # vout (markers: _failed.json == [] AND _scope.json's recorded
    # SPARK_GRAFT_ONLY matches this invocation's — a complete dump from
    # a previous NARROWER run must not masquerade as a full-scope one) —
    # a 25x Verify pass is ~40 CPU-minutes; a compare-phase interruption
    # must not force its rerun.
    scope_path = os.path.join(vout, "_scope.json")
    # a kill between open(scope_path, "w") truncating and the dump
    # completing leaves invalid JSON — exactly the interruption RESUME
    # exists to survive; treat an unreadable scope as a mismatch
    # instead of crashing every subsequent run
    try:
        scope_ok = os.path.exists(scope_path) and \
            json.load(open(scope_path)).get("only") == only
    except (json.JSONDecodeError, OSError):
        scope_ok = False
    resume = os.environ.get("GRAFT_ENVELOPE_RESUME") == "1" and \
        os.path.exists(os.path.join(vout, "_failed.json")) and \
        json.load(open(os.path.join(vout, "_failed.json"))) == [] and \
        scope_ok
    if os.environ.get("GRAFT_ENVELOPE_RESUME") == "1" and not resume \
            and os.path.exists(os.path.join(vout, "_failed.json")):
        print(f"== NOT resuming: dump scope mismatch or incomplete "
              f"(want only={only!r})")
    if resume:
        print(f"== resuming: reusing complete Verify dump in {vout}")
    else:
        print(f"== running graft.Verify over {stress_dir}"
              + (f" (only={only})" if only else ""))
        env = dict(os.environ, SPARK_GRAFT_CPUS="16")
        if only:
            env["SPARK_GRAFT_ONLY"] = only
        errlog = os.path.join(workdir, "verify.stderr")
        with open(errlog, "w") as ef:
            rc = subprocess.call(
                ["java", "-Xmx48g"] + ADD_OPENS +
                ["-cp", cp, "graft.Verify", stress_dir, vout],
                cwd=repo, env=env, stdout=sys.stdout, stderr=ef)
        if rc != 0:
            print(f"Verify exited {rc}", file=sys.stderr)
            return 1
        # record the dump's selection scope so a later RESUME can verify
        # it covers what that invocation wants (see resume gate above)
        json.dump({"only": only}, open(scope_path, "w"))

    # GRAFT_COMPARE_ONLY: narrower regex for the DuckDB-compare step
    # alone (verify + timing still cover `only`). Needed when a family
    # member's ORACLE is O(n^2) in DuckDB (embed_neardup = 1.25B
    # brute-force pairs at 25x — hours) while the engine side is
    # banded/bucketed and completes fine: those rows exact-compare at a
    # smaller multiple in a separate envelope run and time-ratio here.
    cmp_only = os.environ.get("GRAFT_COMPARE_ONLY", only)
    print(f"== DuckDB compare (only={cmp_only})")
    results = compare_local.run_compare(vout, stress_dir, cmp_only)
    failed_dump = json.load(open(os.path.join(vout, "_failed.json")))
    out = {
        "round": rnd,
        "sf_dir": sf_dir,
        "copies": copies,
        "detwinned": use_detwin,
        "only": only,
        "compare_only": cmp_only,
        "n_pass": sum(1 for v in results.values() if v == "pass"),
        "n_fail": sum(1 for v in results.values() if v != "pass"),
        "verify_failed": failed_dump,
        "queries": results,
        # fixed-input rows: pass/fail is real, time_ratio is NOT scale
        # evidence (the operator reruns on the same capped rows)
        "fixed_input": {q: FIXED_INPUT[q] for q in sorted(results)
                        if q in FIXED_INPUT},
    }
    if (use_detwin or with_times) and only:
        # time axis: the same families at 1x and at Nx, per-query ratios
        print(f"== timing families at 1x and {copies}x")
        t1 = _bench(repo, cp, sf_dir, only, os.path.join(workdir, "b1"))
        tn = _bench(repo, cp, stress_dir, only, os.path.join(workdir, "bn"))
        out["times_1x_sec"] = t1
        out["times_nx_sec"] = tn
        out["time_ratio"] = {
            q: round(tn[q] / t1[q], 2)
            for q in tn if q in t1 and t1[q] > 0 and tn[q] > 0}
    out["elapsed_sec"] = round(time.time() - t0, 1)
    suffix = (f"_detwin{copies}x" if use_detwin
              else f"_{copies}x" if with_times else "")
    # GRAFT_ENVELOPE_TAG: extra filename tag so a scoped follow-up run
    # (e.g. just the round's new queries) can't clobber the round's
    # main artifact of the same copies/detwin shape.
    tag = os.environ.get("GRAFT_ENVELOPE_TAG", "")
    if tag:
        suffix = f"_{tag}{suffix}"
    path = os.path.join(repo, f"ENVELOPE_r{rnd:02d}{suffix}.json")
    json.dump(out, open(path, "w"), indent=1, sort_keys=True)
    print(f"== wrote {path}: {out['n_pass']} pass, {out['n_fail']} fail, "
          f"{out['elapsed_sec']} s")
    return 0 if out["n_fail"] == 0 and not failed_dump else 1


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a not in ("--detwin", "--times")]
    use_detwin = "--detwin" in sys.argv
    with_times = "--times" in sys.argv  # 1x-vs-Nx timing without detwin
    rnd = int(args[0])
    sf = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    copies = int(args[2]) if len(args) > 2 else 5
    wd = args[3] if len(args) > 3 else None
    only = args[4] if len(args) > 4 else None
    sys.exit(main(rnd, sf, copies, wd, only, use_detwin, with_times))
