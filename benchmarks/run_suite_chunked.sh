#!/bin/bash
# Run the test suite one file at a time (something in this environment
# reaps single processes that live ~50 min; per-file runs stay short).
# Usage: bash benchmarks/run_suite_chunked.sh [outfile]
set -u
cd "$(dirname "$0")/.."
out="${1:-/tmp/suite_chunked.log}"
: > "$out"
fail=0
for f in tests/test_*.py; do
  line=$(timeout 2400 python -m pytest "$f" -q 2>&1 | tail -1)
  echo "$f: $line" >> "$out"
  case "$line" in
    *failed*|*error*) fail=1 ;;
  esac
done
echo "ALL DONE fail=$fail" >> "$out"
exit $fail
