#!/usr/bin/env bash
# Interleaved subset-bench A/B adjudication (r17 verdict item 6): the
# repo's documented protocol for "did my diff regress key X on a host
# with contention waves", as a script instead of hand-run lore.
#
# The host's load waves (loadavg 1→9 in minutes, outside the VM) make a
# single full-run total meaningless; the protocol is (a) totals on this
# host are min-of-N, (b) per-key questions use INTERLEAVED subset runs
# so a wave hits both sides equally instead of whichever tree happened
# to run inside it.
#
# Usage:
#   tools/ab.sh [-n ROUNDS] [-s SF_DIR] [-r REF] keyprefix [keyprefix ...]
#
#   no -r   quiet-sampling mode: N interleaved runs of the listed key
#           prefixes on a worktree of HEAD; per-key min-of-N vs the
#           BENCH_LAST.json pin — the contention-wave adjudication.
#   -r REF  A/B mode: alternates HEAD-worktree and REF-worktree runs
#           (A B A B …, N rounds each); per-key min-of-N per tree and
#           the B/A ratio.
#
# Both trees are WORKTREES (never the live working tree), so an A/B can
# run in the background while sources are being edited — the one sbt
# concurrency hazard this repo has repeatedly hit. HEAD must contain
# the code under test (commit first). Each run records /proc/loadavg
# so a wave is visible in the table, not inferred.
#
# Env: SPARK_GRAFT_AB_ROOT scratch root (default /tmp/graft_ab).
set -euo pipefail
cd "$(dirname "$0")/.."

rounds=4
sf="/root/testdata/sf0.1"
ref=""
while getopts "n:s:r:" o; do
  case "$o" in
    n) rounds="$OPTARG" ;;
    s) sf="$OPTARG" ;;
    r) ref="$OPTARG" ;;
    *) echo "usage: tools/ab.sh [-n N] [-s SF_DIR] [-r REF] key..."; exit 2 ;;
  esac
done
shift $((OPTIND - 1))
[ $# -ge 1 ] || { echo "usage: tools/ab.sh [-n N] [-s SF_DIR] [-r REF] key..."; exit 2; }
keys=("$@")

root="${SPARK_GRAFT_AB_ROOT:-/tmp/graft_ab}"
mkdir -p "$root"
stamp="$(date +%Y%m%d-%H%M%S)"
out="$root/run_$stamp"
mkdir -p "$out"

tree_of() { # sha -> worktree dir, created on first use
  local sha="$1" dir
  dir="$root/tree_$sha"
  if [ ! -d "$dir" ]; then
    git worktree add --detach "$dir" "$sha" >/dev/null
  fi
  echo "$dir"
}

sha_a="$(git rev-parse HEAD)"
dir_a="$(tree_of "$sha_a")"
dir_b=""
sha_b=""
if [ -n "$ref" ]; then
  sha_b="$(git rev-parse "$ref")"
  dir_b="$(tree_of "$sha_b")"
fi

bench_once() { # treedir label runidx
  local dir="$1" label="$2" idx="$3" dump log load
  dump="$out/${label}_$idx.json"
  log="$out/${label}_$idx.log"
  load="$(cut -d' ' -f1 /proc/loadavg)"
  echo "[ab] run $label#$idx (load $load) ..."
  ( cd "$dir" &&
    SPARK_GRAFT_SF_DIR="$sf" SPARK_GRAFT_BENCH_OUT="$dump" \
      sbt -batch "runMain graft.Bench ${keys[*]}" ) >"$log" 2>&1 \
    || { echo "[ab] run $label#$idx FAILED — see $log"; exit 3; }
  echo "$load" >"$out/${label}_$idx.load"
}

# interleave: A1 B1 A2 B2 … so a load wave spanning one wall-clock
# window taxes both trees, not whichever one ran inside it
for i in $(seq 1 "$rounds"); do
  bench_once "$dir_a" A "$i"
  [ -n "$dir_b" ] && bench_once "$dir_b" B "$i"
done

python3 - "$out" "$rounds" "$sha_a" "$sha_b" <<'PY'
import json, sys, os
out, rounds, sha_a, sha_b = sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4]

def runs(label):
    rs = []
    for i in range(1, rounds + 1):
        p = f"{out}/{label}_{i}.json"
        if not os.path.exists(p):
            continue
        d = json.load(open(p))
        load = open(f"{out}/{label}_{i}.load").read().strip()
        rs.append((d["queries"], float(load)))
    return rs

a = runs("A")
b = runs("B") if sha_b else []
keys = sorted(a[0][0]) if a else []

print(f"\n[ab] A = {sha_a[:10]}" + (f"   B = {sha_b[:10]}" if sha_b else "") +
      f"   ({len(a)}+{len(b)} runs, loads A={[l for _, l in a]}" +
      (f" B={[l for _, l in b]}" if b else "") + ")")
hdr = f"{'key':<28} {'A runs (s)':<28} {'minA':>7}"
if b:
    hdr += f" {'B runs (s)':<28} {'minB':>7} {'B/A':>6}"
print(hdr)
flagged = []
for k in keys:
    av = [q[k] for q, _ in a if k in q]
    line = f"{k:<28} {' '.join(f'{v:6.2f}' for v in av):<28} {min(av):7.2f}"
    if b:
        bv = [q[k] for q, _ in b if k in q]
        ratio = min(bv) / min(av) if min(av) > 0 else float("inf")
        line += f" {' '.join(f'{v:6.2f}' for v in bv):<28} {min(bv):7.2f} {ratio:6.2f}"
        if ratio > 1.5 or ratio < 0.67:
            flagged.append((k, ratio))
    print(line)
ta = [sum(q.values()) for q, _ in a]
line = f"{'TOTAL':<28} {' '.join(f'{v:6.2f}' for v in ta):<28} {min(ta):7.2f}"
if b:
    tb = [sum(q.values()) for q, _ in b]
    line += f" {' '.join(f'{v:6.2f}' for v in tb):<28} {min(tb):7.2f} {min(tb)/min(ta):6.2f}"
print(line)
if flagged:
    print("\n[ab] keys past the 1.5x tripwire (min-of-N vs min-of-N):")
    for k, r in flagged:
        print(f"  {k}: B/A = {r:.2f}")
print(f"\n[ab] raw dumps in {out}")
PY
