#!/bin/bash
# Round-trip smoke test, mirroring the reference's test.sh (test.sh:1-9):
# encode with the lossy-reconstruction side file, decode, and require the
# decoded output to equal the encoder's own reconstruction byte-for-byte.
# Usage: scripts/test.sh input.qual [extra encoder flags...]
set -e
cd "$(dirname "$0")/.."
IN="${1:?usage: test.sh input.qual [flags...]}"
shift || true
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT

PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}" python -m qvz_tpu \
    -u "$TMP/fref.txt" -c 1 -f 0.5 -s --debug-seed "$@" "$IN" "$TMP/out.q"
PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}" python -m qvz_tpu \
    -x "$TMP/out.q" "$TMP/out.dec"
diff "$TMP/fref.txt" "$TMP/out.dec" && echo "Test succeeded!" \
    || { echo "Test FAILED"; exit 1; }
