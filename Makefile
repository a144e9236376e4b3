# Developer entry points (parity with the reference's Makefile targets).

.PHONY: test test-all native bench lint clean

# Fast gate: slow-marked fixtures excluded (pyproject addopts), < 5 min.
test:
	python -m pytest tests/ -x -q

# Full suite including slow-marked fixtures (what CI runs).
test-all:
	python -m pytest tests/ -x -q -m ""

native:
	g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
	    fast_plaid_tpu/native/fastplaid_native.cpp \
	    -o fast_plaid_tpu/native/_fastplaid_native.so

bench:
	python bench.py

lint:
	python -m ruff check fast_plaid_tpu tests || true

clean:
	rm -f fast_plaid_tpu/native/_fastplaid_native.so
	find . -name __pycache__ -type d -exec rm -rf {} +

wheel:
	python -m pip wheel . --no-deps --no-build-isolation -w dist/

sdist:
	python -m pip install --quiet build 2>/dev/null && python -m build --sdist || \
		python setup.py sdist 2>/dev/null || \
		echo "sdist requires the 'build' package"
