# Developer entry points

.PHONY: test test-fast native bench smoke dryrun clean

test:
	python -m pytest tests/ -q

# fast tier: unit/math tests only — interpret-mode kernel suites, process
# spawns, and e2e drives are marked `slow`; in-file sharded classes are
# excluded by name. Budget: < 5 min green on a warm-cache 1-CPU host.
test-fast:
	python -m pytest tests/ -q -x -m "not slow" -k "not Sharded and not sharded"

native: native/libfastloader.so

native/libfastloader.so: native/fastloader.cpp
	g++ -O3 -march=native -fno-math-errno -std=c++17 -shared -fPIC -pthread $< -o $@

bench:
	python bench.py

smoke:
	python examples/smoke_test.py --steps 100

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

clean:
	rm -rf native/libfastloader.so **/__pycache__ .pytest_cache
