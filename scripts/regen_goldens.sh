#!/usr/bin/env bash
# Regenerate golden-file oracles for engine-valued queries at one SF.
#
# Protocol (COVERAGE.md "Round 5"/"Round 12"): run the queries through
# graft.Verify at TWO core counts, require row-identical output (parquet
# BYTES legitimately differ across core counts — dictionary/encoding
# state — so rows are compared as sorted values, exactly like the
# driver's checker), then copy the single part file into
# goldens/<sfLabel>/<query>.parquet. graft.Verify re-points golden
# oracles to goldens/<sfLabel>/ automatically when run at that SF.
#
# Usage: scripts/regen_goldens.sh <sfDir> <query> [query ...]
#   e.g. scripts/regen_goldens.sh /root/testdata/sf0.1 q_winnow q_fingerprint
set -euo pipefail
SF_DIR="$1"; shift
QUERIES=("$@")
[ ${#QUERIES[@]} -gt 0 ] || { echo "need at least one query name" >&2; exit 2; }
SF_LABEL="$(basename "$SF_DIR")"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CP="$REPO/target/scala-2.13/classes:/opt/spark/jars/*"
OPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
--add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED \
--add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED \
--add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
--add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
--add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED \
--add-opens java.base/sun.util.calendar=ALL-UNNAMED"
OUT_A="$(mktemp -d /tmp/golden_a.XXXXXX)"; OUT_B="$(mktemp -d /tmp/golden_b.XXXXXX)"
for CPUS in 32 8; do
  DEST=$([ "$CPUS" = 32 ] && echo "$OUT_A" || echo "$OUT_B")
  echo "[regen] Verify @ $CPUS cores -> $DEST"
  SPARK_GRAFT_CPUS=$CPUS java $OPTS -Xmx24g -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.Verify "$SF_DIR" "$DEST" "${QUERIES[@]}" >"$DEST/run.log" 2>&1
done
python3 - "$OUT_A" "$OUT_B" "${QUERIES[@]}" <<'EOF'
import sys, glob
import pandas as pd
a_dir, b_dir, *queries = sys.argv[1:]
def load(d, q):
    files = glob.glob(f"{d}/{q}/part-*.parquet")
    assert files, f"{q}: no output under {d} (query failed? see run.log)"
    # the pin step copies exactly one part file, so the comparison must see
    # the whole output in that one file — a multi-part output would silently
    # compare (and pin) a partial shard
    assert len(files) == 1, f"{q}: {len(files)} part files under {d} — " \
        "golden outputs must coalesce to a single part before pinning"
    df = pd.read_parquet(files[0]).astype(str)
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)
bad = [q for q in queries if not load(a_dir, q).equals(load(b_dir, q))]
if bad:
    sys.exit(f"NOT cross-core deterministic, refusing to pin: {bad}")
print("[regen] all queries row-identical across core counts")
EOF
mkdir -p "$REPO/goldens/$SF_LABEL"
for q in "${QUERIES[@]}"; do
  cp "$OUT_A/$q"/part-*.parquet "$REPO/goldens/$SF_LABEL/$q.parquet"
  echo "[regen] pinned goldens/$SF_LABEL/$q.parquet"
done
echo "[regen] done — re-run the gate: graft.Verify $SF_DIR <out> ${QUERIES[*]} + scripts/oracle_check.py"
