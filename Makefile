# Developer entry points (parity with the reference's Makefile targets,
# adapted: test / native / bench / dudect / docs / lint).

PY ?= python3

.PHONY: test test-fast test-slow native bench dudect docs lint clean fuzz

fuzz:
	$(PY) -m lambda_snark_tpu fuzz --iterations 20000

test:
	$(PY) -m pytest tests/ -q

# two-tier suite (tests/conftest.py enumerates the slow modules):
# fast = host-path tests, ~20 s; slow = XLA-compile-bound device paths,
# ~4 min warm / ~20 min cold (persistent cache under .jax_compile_cache_tests)
test-fast:
	$(PY) -m pytest tests/ -q -m "not slow"

test-slow:
	$(PY) -m pytest tests/ -q -m slow

native:
	cmake -S native -B native/build -G Ninja
	ninja -C native/build

native-asan:
	cmake -S native -B native/build-asan -G Ninja -DLAMBDA_SNARK_USE_ASAN=ON
	ninja -C native/build-asan

bench:
	$(PY) bench.py

dudect:
	$(PY) -c "from lambda_snark_tpu.utils.dudect import *; \
print(mod_pow_timing_report(17592186044423)); \
print(gaussian_timing_report())"

docs:
	mkdocs build 2>/dev/null || echo "mkdocs not installed; docs/ is readable as markdown"

lint:
	$(PY) -m ruff check lambda_snark_tpu tests --select E9,F63,F7,F82 2>/dev/null \
		|| $(PY) -m py_compile $$(git ls-files '*.py')

clean:
	rm -rf native/build native/build-asan .jax_compile_cache artifacts
