#!/usr/bin/env bash
# Repeated-trial soak runner for the fault-tolerance analogue —
# the port of the reference's flake harness
# (/root/reference/src/main/test-mr-many.sh:15-22), which reruns the
# full test script N times and fails on the first red trial. Here the
# system under test is Spark's task-retry scheduler driven by our
# crash-injection test (tests/test_fault_tolerance.py: a UDF that
# crashes on every first task attempt must still produce the same
# result as a healthy run).
#
# Usage: scripts/soak_fault_tolerance.sh [numTrials]   # default 5

set -u
runs="${1:-5}"
cd "$(dirname "$0")/.."

for i in $(seq 1 "$runs"); do
    echo "=== trial $i/$runs ==="
    if ! timeout -k 2s 900s python -m pytest tests/test_fault_tolerance.py -q; then
        echo "*** FAILED TESTS IN TRIAL $i"
        exit 1
    fi
done
echo "*** PASSED ALL $runs TESTING TRIALS"
