#!/usr/bin/env bash
# Differential fuzz loop (the harness graft.Fuzz's scaladoc promises).
#
# Per seed: generate the adversarial corpus (graft.Fuzz — NULL/empty/
# unicode texts, duplicate classes, tied sort keys, dangling FKs, zero
# vectors), run the FULL Verify surface on it, then oracle-compare every
# key with tools/check.py — the same rows/schema/hash gate the driver
# runs, on a corpus the queries were never tuned against. Round 14 ran
# this loop by hand and caught four real cross-engine bugs (zero-norm
# cosine, NULL-text pack fold, NULL band keys, empty-text segmenter
# descent); this script makes that run reproducible.
#
# Usage: tools/fuzz.sh [seed ...]        default seeds: 0 1 2 3 4
# Env:   FUZZ_DIR   scratch root        (default /tmp/graft_fuzz)
#        FUZZ_KEYS  comma-separated key subset forwarded to Verify
#                   (entries may end in `*` for a prefix match)
#        FUZZ_SPLIT micro-batch count(s) for the D-block split lane —
#                   a single k or a comma list, e.g. "2,4,8" (default
#                   4; 0 disables). Each k re-stages the SAME corpus as
#                   k watermark-respecting random batch cuts
#                   (GRAFT_STREAM_SPLIT) and requires every D key to
#                   STILL hash-match its batch oracle — the
#                   batch-boundary adversary for cross-batch state
#                   (d33's click-memory gap was this bug class).
#        FUZZ_SPLIT_ONLY=1 reuse the existing corpus_s<seed> dirs and
#                   run ONLY the split lane(s) — for width sweeps after
#                   a full run has already generated the corpus and
#                   proven the single-batch lane (ci.sh's k∈{2,8}
#                   sweep). Fails if a corpus dir is missing.
#
# Exit 0 iff every seed dumps every key AND every key hash-matches DuckDB,
# in both the single-batch and (unless disabled) the split-replay lane.
set -uo pipefail
cd "$(dirname "$0")/.."

seeds=("$@")
if [ ${#seeds[@]} -eq 0 ]; then seeds=(0 1 2 3 4); fi
root="${FUZZ_DIR:-/tmp/graft_fuzz}"
mkdir -p "$root"

# One sbt invocation for ALL seeds (startup + compile amortized); each
# runMain forks its own JVM (run/fork := true in build.sbt).
split_only="${FUZZ_SPLIT_ONLY:-0}"
if [ "$split_only" = "1" ]; then
  for s in "${seeds[@]}"; do
    [ -d "$root/corpus_s$s" ] || {
      echo "[fuzz] FUZZ_SPLIT_ONLY=1 but $root/corpus_s$s missing — run a full lane first"
      exit 2
    }
  done
else
  cmds=()
  for s in "${seeds[@]}"; do
    rm -rf "$root/corpus_s$s" "$root/out_s$s"
    cmds+=("runMain graft.Fuzz $root/corpus_s$s $s")
    if [ -n "${FUZZ_KEYS:-}" ]; then
      cmds+=("runMain graft.Verify $root/corpus_s$s $root/out_s$s $FUZZ_KEYS")
    else
      cmds+=("runMain graft.Verify $root/corpus_s$s $root/out_s$s")
    fi
  done
  sbt -batch "${cmds[@]}" || { echo "[fuzz] sbt run failed"; exit 2; }
fi

# Split lane(s): one more sbt invocation PER k with GRAFT_STREAM_SPLIT
# exported (env is per-process, so the single-batch lane above — and
# each k — must run in its own sbt). Seeds derive per (corpus, table)
# inside staged(), so one env value covers every seed.
IFS=',' read -r -a split_ks <<<"${FUZZ_SPLIT:-4}"
if [ "${split_ks[0]}" = "0" ]; then split_ks=(); fi
for split_k in "${split_ks[@]}"; do
  scmds=()
  for s in "${seeds[@]}"; do
    rm -rf "$root/out_s${s}_split$split_k"
    scmds+=("runMain graft.Verify $root/corpus_s$s $root/out_s${s}_split$split_k d*")
  done
  GRAFT_STREAM_SPLIT="$split_k" sbt -batch "${scmds[@]}" \
    || { echo "[fuzz] split-lane (k=$split_k) sbt run failed"; exit 2; }
done

fail=0
for s in "${seeds[@]}"; do
  out="$root/out_s$s"
  if [ "$split_only" != "1" ]; then
  # Verify exits 0 even when a query dies (driver-budget semantics), so
  # gate BY NAME: every key in oracle_sql.json must have its own dump
  # dir (a count compare would let a rows-only key's extra dir pad over
  # a crashed oracle'd key — check.py iterates only existing dirs, so
  # the missing key would never even be compared). A missing/unreadable
  # oracle_sql.json is itself a failure.
  if ! missing=$(python3 - "$out" <<'PY'
import json, os, sys
out = sys.argv[1]
keys = sorted(json.load(open(f"{out}/oracle_sql.json")))
missing = [k for k in keys if not os.path.isdir(os.path.join(out, k))]
print(f"=== {len(keys) - len(missing)}/{len(keys)} oracle'd keys dumped ===",
      file=sys.stderr)
print(" ".join(missing))
PY
  ); then
    echo "[fuzz] seed $s: oracle_sql.json missing/unreadable — Verify died at startup"
    fail=1
    continue
  fi
  if [ -n "$missing" ]; then
    echo "[fuzz] seed $s: MISSING DUMPS ($missing) — a query crashed; see Verify stderr above"
    fail=1
  fi
  python3 tools/check.py "$out" "$root/corpus_s$s" || fail=1
  fi # split_only skips the single-batch gate (ran in the prior full lane)
  for split_k in "${split_ks[@]}"; do
    sout="$root/out_s${s}_split$split_k"
    echo "--- seed $s split lane (k=$split_k) ---"
    if ! smissing=$(python3 - "$sout" <<'PY'
import json, os, sys
out = sys.argv[1]
keys = sorted(json.load(open(f"{out}/oracle_sql.json")))
missing = [k for k in keys if not os.path.isdir(os.path.join(out, k))]
print(f"=== {len(keys) - len(missing)}/{len(keys)} split-lane keys dumped ===",
      file=sys.stderr)
print(" ".join(missing))
PY
    ); then
      echo "[fuzz] seed $s split k=$split_k: oracle_sql.json missing — Verify died at startup"
      fail=1
      continue
    fi
    if [ -n "$smissing" ]; then
      echo "[fuzz] seed $s split k=$split_k: MISSING DUMPS ($smissing) — a query crashed under split replay"
      fail=1
    fi
    python3 tools/check.py "$sout" "$root/corpus_s$s" || fail=1
  done
done

if [ "$fail" -eq 0 ]; then
  echo "[fuzz] ALL SEEDS GREEN: ${seeds[*]}"
else
  echo "[fuzz] FAILURES — see per-seed output above"
fi
exit "$fail"
