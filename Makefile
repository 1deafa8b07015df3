# Developer workflow (reference analogue: Makefile targets test/lint/ci)

PY ?= python

.PHONY: test test-fast test-parity bench train-quick train-vanilla comparison sweep dryrun clean ci

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x -k "not e2e and not fit and not train_metric"

test-parity:
	$(PY) -m pytest tests/test_metric.py tests/test_flows.py tests/test_e2e_parity.py tests/test_interop.py -q

bench:
	$(PY) bench.py

train-quick:
	$(PY) run_experiment.py training=quick visualization=minimal

train-vanilla:
	$(PY) run_experiment.py model=vanilla_vae training=quick visualization=minimal

comparison:
	$(PY) run_experiment.py experiment=comparison_study training=quick visualization=minimal

sweep:
	$(PY) run_experiment.py experiment=hyperparameter_sweep training=quick visualization=minimal

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
		$(PY) __graft_entry__.py 8

native:
	g++ -O3 -std=c++17 -shared -fPIC -o native/build/libdataloader.so native/dataloader.cpp -lpthread

clean:
	rm -rf outputs .pytest_cache native/build
	find . -name __pycache__ -type d -exec rm -rf {} +

ci: test
