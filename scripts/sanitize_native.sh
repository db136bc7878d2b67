#!/usr/bin/env bash
# Sanitizer tier for the native C++ host runtime (libbathio).
#
# The reference's level-3 testsuite is its whole test set re-run under
# valgrind (ref testsuite/testsuite.sqc:186-237).  bath_tpu's
# equivalent: rebuild bath_tpu/native/src/bathio.cpp with
# ASAN+UBSAN (fail-fast, no recovery), route the bindings at it via
# BATH_NATIVE_SO, and run the native-parity tests plus the golden
# end-to-end numpy-backend tests — every filter/envelope entry point
# the production pipeline uses gets exercised with real workloads
# under the sanitizers.  (valgrind is not present in this image;
# ASAN's shadow-memory checking covers the same out-of-bounds /
# use-after-free class, UBSAN adds signed-overflow/shift/alignment.)
#
# Usage: scripts/sanitize_native.sh [extra pytest args]
# A clean exit (rc=0) is the record; see
# bench_artifacts/sanitize_r5.txt for the committed run log.
set -euo pipefail
cd "$(dirname "$0")/.."

SO="${TMPDIR:-/tmp}/libbathio.asan.so"
echo "# building $SO (ASAN+UBSAN, -O1 -g)"
g++ -O1 -g -march=native -ffp-contract=off -fopenmp -shared -fPIC \
    -fsanitize=address,undefined -fno-sanitize-recover=all \
    -o "$SO" bath_tpu/native/src/bathio.cpp

LIBASAN="$(g++ -print-file-name=libasan.so)"
LIBUBSAN="$(g++ -print-file-name=libubsan.so)"
export BATH_NATIVE_SO="$SO"
# python is not ASAN-instrumented, so the runtime must be preloaded;
# leak checking is off (the CPython interpreter "leaks" by design),
# every other check aborts the process on first report
export LD_PRELOAD="$LIBASAN $LIBUBSAN"
export ASAN_OPTIONS="detect_leaks=0,abort_on_error=1,allocator_may_return_null=1"
export UBSAN_OPTIONS="print_stacktrace=1,halt_on_error=1"

python -c "from bath_tpu import native; assert native.available(), \
    'sanitized libbathio failed to load'; print('# sanitized lib loaded')"
exec python -m pytest tests/test_native.py tests/test_golden_outputs.py \
    tests/test_splice.py -q "$@"
