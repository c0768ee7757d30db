#!/usr/bin/env bash
# Pre-snapshot gate: compile + full test suite. Run before every
# end-of-round snapshot so the committed HEAD is provably green
# (round-8/9 verdict ask). Exits non-zero on the first failure.
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch Test/compile
sbt -batch test
echo "[pregate] compile + tests green"
