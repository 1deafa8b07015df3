# Developer workflow (reference analogue: Makefile targets test/lint/ci)

PY ?= python

# NB: `native` MUST be phony — it collides with the native/ source
# directory, which make otherwise treats as an up-to-date target
.PHONY: test test-fast test-parity bench train-quick train-vanilla comparison sweep dryrun clean ci lint native

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

# black/isort/mypy are not installable in this environment (no egress);
# lint = byte-compile every source (syntax gate) + import the full public
# package surface with warnings-as-errors (the reference's make lint
# analogue, reference: Makefile:27-40)
lint:
	$(PY) -m compileall -q rlvae_tpu scripts tests run_experiment.py bench.py __graft_entry__.py
	JAX_PLATFORMS=cpu $(PY) -W error::SyntaxWarning -c "\
	import rlvae_tpu, rlvae_tpu.train, rlvae_tpu.samplers, rlvae_tpu.models, \
	rlvae_tpu.models.research, rlvae_tpu.flows, rlvae_tpu.geometry, \
	rlvae_tpu.viz, rlvae_tpu.data, rlvae_tpu.parallel, rlvae_tpu.utils, \
	rlvae_tpu.config, rlvae_tpu.inference, rlvae_tpu.app_server"

ci: lint test
