#!/bin/bash
# VERDICT r14 item 3: run each DedupBench case in its OWN JVM so the
# mult=200 spike has warm (pass2) numbers — the six-case single-JVM run
# accumulated ~13 min of shuffle/session state and pass2 threw on five
# of six cases. A real cluster runs one app per job; forking per case is
# the honest local stand-in.
#
# Usage: scripts/dedup_spike_forked.sh [MULT] [OUT_JSON]
set -euo pipefail
cd "$(dirname "$0")/.."

MULT="${1:-200}"
OUT="${2:-bench/DEDUP_SPIKE_r15_mult${MULT}.json}"
CASES="light_spans light_dedup heavy_spans heavy_dedup hot_spans hot_dedup"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done

TMP="$(mktemp -d)"
trap 'rm -rf "$TMP"' EXIT
for c in $CASES; do
  echo "[dedup-spike-forked] mult=$MULT case=$c" >&2
  SPARK_GRAFT_SF_DIR="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" \
  SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  SPARK_GRAFT_DEDUP_MULT="$MULT" \
  SPARK_GRAFT_DEDUP_CASES="$c" \
  java $ADD_OPENS -Xmx"${SPARK_DRIVER_MEM:-48g}" \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.DedupBench > "$TMP/$c.json"
done

python3 - "$TMP" "$OUT" "$MULT" <<'EOF'
import json, sys, glob, os
tmp, out, mult = sys.argv[1], sys.argv[2], int(sys.argv[3])
merged = {"metric": "dedup_spike", "unit": "sec", "mult": mult,
          "forked": True, "pass2": {}, "pass1": {}}
saw_hot = False
for f in sorted(glob.glob(os.path.join(tmp, "*.json"))):
    # ADVICE r15: a case JVM that exits 0 without printing its JSON line
    # (or prints a truncated one) must fail with the CASE named, not an
    # IndexError/KeyError after all six multi-minute runs completed
    case = os.path.basename(f)[:-5]
    with open(f) as fh:
        lines = [l for l in fh if l.strip().startswith("{")]
    if not lines:
        sys.exit(f"[dedup-spike-forked] case {case}: no JSON line in its "
                 f"output ({f}) — the forked JVM printed nothing parseable")
    try:
        d = json.loads(lines[-1])
        for k in ("sf", "w", "cpus"):
            merged[k] = d[k]
        merged["pass2"].update(d["pass2"])
        merged["pass1"].update(d["pass1"])
    except (json.JSONDecodeError, KeyError) as e:
        sys.exit(f"[dedup-spike-forked] case {case}: malformed JSON line "
                 f"({e}) in {f}")
    if d.get("hot_top_share", -1.0) >= 0:
        merged["hot_top_share"] = d["hot_top_share"]
        merged["hot_top_skew"] = d["hot_top_skew"]
        saw_hot = True
    if d.get("n_docs", -1) >= 0:
        merged["n_docs"] = d["n_docs"]
if not saw_hot:
    print("[dedup-spike-forked] WARNING: no hot_* case in the selected set "
          "— merged artifact has no n_docs/hot_top_share fields",
          file=sys.stderr)
with open(out, "w") as fh:
    fh.write(json.dumps(merged) + "\n")
print(json.dumps(merged))
EOF
