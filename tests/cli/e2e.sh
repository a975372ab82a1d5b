#!/usr/bin/env bash
# Shell-level CLI end-to-end test (reference: tests/cli/harness.sh +
# test-train-recommend.sh): exercises the REAL command line — fetch/convert/
# describe/split/subset, train -> recommend, doctor — with TAP-ish output.
# Run directly or via tests/cli/test_cli_e2e.py.

set -u
export JAX_PLATFORMS=cpu
REPO="$(cd "$(dirname "$0")/../.." && pwd)"
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
ML=/root/reference/data/ml-latest-small
WORK="$(mktemp -d)"
trap 'rm -rf "$WORK"' EXIT

N=0
FAIL=0
check() {
    N=$((N + 1))
    if "$@" > "$WORK/out.$N" 2>&1; then
        echo "ok $N - $*"
    else
        echo "not ok $N - $*"
        sed 's/^/#   /' "$WORK/out.$N" | tail -20
        FAIL=1
    fi
}

cli() { python -m lkpy_tpu.cli "$@"; }

check cli --help
check cli data fetch ml-latest-small "$WORK/raw"
check cli data convert --movielens "$ML" "$WORK/ds"
check cli data describe "$WORK/ds"
check cli data split --test-frac 0.2 --users 50 --seed 42 "$WORK/ds" "$WORK/split"
check cli data subset --min-item-count 5 "$WORK/ds" "$WORK/dense"
check cli train -m bias -o "$WORK/pipe.pkl" "$WORK/split/train"
check test -s "$WORK/pipe.pkl"
check cli recommend -m "$WORK/pipe.pkl" -n 5 1
check cli doctor

# shipped pipeline library (reference: pipelines/als-implicit-search.toml):
# expand one spec file and run a real (tiny) tune through a search file
check cli pipeline expand -f "$REPO/pipelines/als-implicit.toml"
cat > "$WORK/bias-tune.toml" <<'EOF'
[search]
max_points = 2
list_length = 20
metric = "RMSE"

[space.scorer]
damping.user = { type = "float", min = 0.1, max = 100, scale = "log" }
damping.item = { type = "float", min = 0.1, max = 100, scale = "log" }

[pipeline.meta]
name = "bias"

[pipeline.options]
base = "std:topn-predict"

[pipeline.components.scorer]
class = "lkpy_tpu.models.bias:BiasScorer"
EOF
check cli tune -s "$WORK/bias-tune.toml" -o "$WORK/tune.json" "$WORK/dense"
check test -s "$WORK/tune.json"

echo "1..$N"
exit $FAIL
