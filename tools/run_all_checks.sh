#!/usr/bin/env bash
# One-command verification: unit+property tests, DuckDB oracle parity,
# physical-plan audits. (Benchmarks are separate: bench.py,
# tools/bench_scaling.py.)
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pytest tests/ -q
python tools/compare_oracle.py /root/testdata/sf0.01
python tools/plan_audit.py
python tools/audit_loops.py
echo "ALL CHECKS PASSED"
