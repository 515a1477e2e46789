#!/usr/bin/env bash
# Pre-snapshot gate (VERDICT r12 task 2): refuse an end-of-round (or any
# milestone) commit unless the tree COMPILES and a one-entry Verify
# smoke passes its DuckDB oracle at sf0.001. Exists because round 12's
# final snapshot commit shipped a one-line compile break that zeroed the
# whole round's driver gate (CORRECTNESS_r12.json = {}) — this script
# makes that class of failure impossible: run it immediately before the
# snapshot commit; a nonzero exit means DO NOT COMMIT. Record each green
# run in SURVEY.md §8's ledger.
#
# Usage: tools/presnapshot.sh [entry] [sf_dir]
#   entry   Verify entry prefix to smoke (default g6 — a deep medallion
#           query: exercises ingest, silver transforms, committed gold).
#   sf_dir  scale dir (default /root/testdata/sf0.001).
set -u
cd "$(dirname "$0")/.."

ENTRY="${1:-g6}"
SF_DIR="${2:-/root/testdata/sf0.001}"
OUT="/tmp/graft_presnapshot_out"

echo "[presnapshot] 1/3 sbt compile (Test/compile included)"
if ! sbt -batch "Test/compile" >/tmp/graft_presnapshot_compile.log 2>&1; then
  tail -30 /tmp/graft_presnapshot_compile.log
  echo "[presnapshot] FAIL: compile broken — DO NOT COMMIT"
  exit 1
fi

echo "[presnapshot] 2/3 Verify smoke: entry=$ENTRY sf=$SF_DIR"
rm -rf "$OUT"
if ! SPARK_GRAFT_VERIFY_ONLY="$ENTRY" \
     sbt -batch "runMain graft.Verify $SF_DIR $OUT" \
     >/tmp/graft_presnapshot_verify.log 2>&1; then
  tail -30 /tmp/graft_presnapshot_verify.log
  echo "[presnapshot] FAIL: Verify run errored — DO NOT COMMIT"
  exit 1
fi
# Verify swallows per-entry failures into stderr lines; an empty or
# missing result dir must fail the gate, not pass it vacuously.
if ! ls "$OUT/$ENTRY"*/_SUCCESS >/dev/null 2>&1 &&
   ! ls "$OUT/$ENTRY"*/*.parquet >/dev/null 2>&1; then
  grep "\[verify\]" /tmp/graft_presnapshot_verify.log || true
  echo "[presnapshot] FAIL: no result parquet for entry '$ENTRY' — DO NOT COMMIT"
  exit 1
fi

echo "[presnapshot] 3/3 DuckDB oracle compare (tools/check.py)"
if ! python3 tools/check.py "$OUT" "$SF_DIR" >/tmp/graft_presnapshot_check.log 2>&1; then
  tail -30 /tmp/graft_presnapshot_check.log
  echo "[presnapshot] FAIL: oracle mismatch — DO NOT COMMIT"
  exit 1
fi

echo "[presnapshot] PASS: compile green, $ENTRY hash-matches its oracle at $SF_DIR — safe to commit"
