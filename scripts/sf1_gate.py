#!/usr/bin/env python3
"""Scale-correctness gate past sf0.1 (VERDICT r12 #1): run the DuckDB
oracle compare against an sf~1 ScaleUp replica and emit a committed
artifact (CORRECTNESS_SF1_r{N}.json).

Every correctness proof through round 12 stops at sf0.1 (~10^6 rows); the
100 TB posture otherwise rests on plan audits + SkewStressSpec. This gate
re-runs the full value compare at 10x: the law queries (SF-independent by
design) plus the most expensive operators, each against its real DuckDB
oracle over the SAME replica tables.

The 13 golden-file queries are skipped BY CONSTRUCTION (their oracles are
per-SF pinned engine outputs; no sf1 golden exists) — each is covered here
by its law twin instead. The skip list is explicit in the artifact.

Usage: sf1_gate.py [--rows-only q1,q2] <sfDir> <outDir> <artifact.json> [query ...]
  (run after `graft.Verify <sfDir> <outDir> <query ...>`)

--rows-only: queries whose DuckDB oracle is prohibitive at this scale are
checked rows+schema-only (the judge-sanctioned fallback); each one is
recorded in the artifact with mode "rows_only_forced" so the weaker check
is explicit, never silent.
"""
import json, os, sys, glob, threading
import duckdb
import pandas as pd

ORACLE_TIMEOUT_S = float(os.environ.get("SF1_ORACLE_TIMEOUT_S", "600"))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from oracle_check import canon, compare, register_tables

GOLDEN_SKIP = {
    "q_ann_lsh": "golden oracle (per-SF pinned output); q_ann_lsh_law covers the family",
    "q_bpe_merges": "golden oracle; q_bpe_merges_law covers the round-trip law",
    "q_dedup_clusters": "golden oracle; q_dedup_clusters_law covers the component laws",
    "q_dedup_minhash": "golden oracle; q_dedup_minhash_law covers planted recall",
    "q_dedup_simhash": "golden oracle; q_dedup_simhash_law covers planted recall",
    "q_deflate_ratio": "golden oracle; q_deflate_ratio_law covers the ratio laws",
    "q_embed_neardup": "golden oracle; q_embed_neardup_law covers planted pairs",
    "q_fingerprint": "golden oracle; q_fingerprint_law covers the kernel law",
    "q_multimodal_stub_features": "golden oracle; q_multimodal_stub_features_law covers the shape contract",
    "q_near_dedup": "golden oracle; q_near_dedup_law + q_near_dedup_keepbest_law cover the family",
    "q_pq_encode": "golden oracle; q_pq_encode_law covers the re-encode round-trip",
    "q_semantic_dedup": "golden oracle; q_semantic_dedup_law covers the component laws",
    "q_winnow": "golden oracle; q_winnow_law covers the kernel replay",
}


def main():
    args = sys.argv[1:]
    rows_only_forced = set()
    allow_goldens = False
    while args and args[0].startswith("--"):
        if args[0] == "--rows-only":
            rows_only_forced = set(args[1].split(","))
            args = args[2:]
        elif args[0] == "--allow-goldens":
            # goldens/<sfLabel>/ has been pinned for THIS SF through the
            # cross-core regen protocol, so golden queries are gateable
            # here like at any other SF (Verify re-points their SQL)
            allow_goldens = True
            args = args[1:]
        else:
            sys.exit(f"unknown flag {args[0]}")
    sf_dir, out_dir, artifact = args[0], args[1], args[2]
    only = args[3:]
    con = duckdb.connect()
    register_tables(con, sf_dir)
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    queries = only if only else sorted(oracle)
    results, npass = {}, 0
    sf_label = os.path.basename(os.path.normpath(sf_dir))
    for name in queries:
        if name in GOLDEN_SKIP:
            assert allow_goldens, f"{name} is golden-pinned — pass --allow-goldens after pinning goldens/{sf_label}/"
            golden = f"/root/repo/goldens/{sf_label}/{name}.parquet"
            assert os.path.exists(golden), f"{name}: no golden at {golden}"
        res_dir = os.path.join(out_dir, name)
        files = sorted(glob.glob(os.path.join(res_dir, "*.parquet")))
        entry = {"mode": "oracle", "pass": False, "spark_rows": None,
                 "oracle_rows": None, "problems": []}
        try:
            if not files:
                entry["problems"] = ["NO SPARK OUTPUT"]
            elif name in rows_only_forced:
                n = sum(len(pd.read_parquet(f)) for f in files)
                entry.update(mode="rows_only_forced", spark_rows=n,
                             problems=[] if n > 0 else ["rows-only: NO/EMPTY OUTPUT"])
            elif name not in oracle:
                n = sum(len(pd.read_parquet(f)) for f in files)
                entry.update(mode="rows_only", spark_rows=n,
                             problems=[] if n > 0 else ["rows-only: NO/EMPTY OUTPUT"])
            else:
                spark_df = pd.concat([pd.read_parquet(f) for f in files],
                                     ignore_index=True)
                # a prohibitive oracle must not stall the whole gate: past
                # the timeout, interrupt DuckDB and fall back to the
                # rows+schema-only check — recorded as the WEAKER mode.
                # The timer sets a flag BEFORE interrupting: an interrupt
                # that fires just as a query finishes (losing the race
                # against timer.cancel()) lands on the NEXT query on this
                # shared connection — without the flag that fast query
                # would silently downgrade to rows_only_timeout. An
                # InterruptException with the flag clear is such a stray:
                # retry the query once (its own timer is still armed, so a
                # genuine timeout during the retry still raises with the
                # flag set).
                timed_out = {"flag": False}
                def _interrupt():
                    timed_out["flag"] = True
                    con.interrupt()
                timer = threading.Timer(ORACLE_TIMEOUT_S, _interrupt)
                timer.start()
                try:
                    try:
                        duck_df = con.execute(oracle[name]).fetchdf()
                    except duckdb.InterruptException:
                        if timed_out["flag"]:
                            raise
                        duck_df = con.execute(oracle[name]).fetchdf()
                finally:
                    timer.cancel()
                entry.update(spark_rows=len(spark_df), oracle_rows=len(duck_df),
                             problems=compare(name, spark_df, duck_df))
        except duckdb.InterruptException:
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            entry.update(mode="rows_only_timeout", spark_rows=n, oracle_rows=None,
                         problems=[] if n > 0 else ["rows-only: NO/EMPTY OUTPUT"])
            print(f"     (oracle exceeded {ORACLE_TIMEOUT_S:.0f}s — "
                  "rows+schema fallback, recorded as rows_only_timeout)")
        except Exception as e:
            entry["problems"] = [f"CHECK ERROR: {type(e).__name__}: {e}"]
        entry["pass"] = not entry["problems"]
        npass += entry["pass"]
        results[name] = entry
        print(("PASS " if entry["pass"] else "FAIL ") + name, flush=True)
        for p in entry["problems"]:
            print(f"     {p}")
    body = {
        "sf_dir": sf_dir,
        "replica": "graft.tools.ScaleUp: 10 self-consistent copies of "
                   "/root/testdata/sf0.1 (disjoint key universes, shared dims; "
                   "~6M lineitem / 50k documents / 20k embeddings)",
        "gate": "full DuckDB value compare (schema + rows + per-cell), "
                "identical to the sf0.01/sf0.1 gates",
        "pass": npass, "total": len(results),
        "oracle_timeout_s": ORACLE_TIMEOUT_S,
        "rows_only_forced": sorted(rows_only_forced),
        "queries": results,
        "skipped": {k: v for k, v in GOLDEN_SKIP.items() if k not in set(queries)},
    }
    with open(artifact, "w") as f:
        json.dump(body, f, indent=1, sort_keys=False)
    print(f"== {npass}/{len(results)} PASS == -> {artifact}")
    sys.exit(0 if npass == len(results) else 1)


if __name__ == "__main__":
    main()
