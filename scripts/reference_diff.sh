#!/usr/bin/env bash
# All-22 TPC-H exact-diff gate (tpch.rs --expected-results parity,
# benchmarks/src/bin/tpch.rs:421-422).
#
# Ingests dbgen-format .tbl files (generating them from the deterministic
# datagen if absent — real dbgen output drops in unchanged) and diffs
# every query's result EXACTLY against the committed answer fixture
# answers/sf<SF>/answers/q{n}.out.
#
# Usage: scripts/reference_diff.sh [SF] [platform]
#   SF        scale factor with a committed fixture (default 1)
#   platform  cpu (default) | tpu — cpu runs anywhere; tpu needs the chip
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${1:-1}"
PLATFORM="${2:-cpu}"
TBL_DIR="${BALLISTA_TBL_DIR:-/tmp/tpch_tbl_sf$SF}"
EXPECTED="answers/sf$SF"

[ -d "$EXPECTED/answers" ] || {
  echo "no committed answer fixture at $EXPECTED — generate with" >&2
  echo "  python -c 'from ballista_tpu.datagen import generate_tpch;" >&2
  echo "             from ballista_tpu.datagen.tbl import write_answers;" >&2
  echo "             from ballista_tpu.benchmarks.oracle import to_pd;" >&2
  echo "             write_answers(to_pd(generate_tpch($SF)), \"$EXPECTED\")'" >&2
  exit 1
}

if [ ! -f "$TBL_DIR/lineitem.tbl" ]; then
  echo "# generating dbgen-format .tbl files at SF$SF -> $TBL_DIR" >&2
  python -m ballista_tpu.datagen --sf "$SF" --format tbl --out "$TBL_DIR"
fi

ENV=()
if [ "$PLATFORM" = cpu ]; then
  ENV+=(JAX_PLATFORMS=cpu)
fi
exec env "${ENV[@]}" python -m ballista_tpu.benchmarks.runner \
  --sf "$SF" --iterations 1 --tbl-dir "$TBL_DIR" --expected "$EXPECTED" \
  ${BALLISTA_DIFF_QUERIES:+--queries "$BALLISTA_DIFF_QUERIES"}
