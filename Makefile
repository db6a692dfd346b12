.PHONY: test tpu-test bench bench-e2e dryrun smoke eval-smoke

test:
	python -m pytest tests/ -q

# Compiled-TPU lane (VERDICT r2 #9): runs the Mosaic/compiled tests on the
# REAL chip once per round so kernel regressions don't surface first in
# bench runs. Needs the axon TPU; ~minutes on first compile (cache warms).
tpu-test:
	COMORAG_TEST_TPU=1 python -m pytest tests/test_tpu_compiled.py -q

bench:
	python bench.py

bench-e2e:
	python scripts/bench_e2e.py --chunks 10000 --queries 64

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 python -c "\
	import os; os.environ['JAX_PLATFORMS']='cpu'; import jax; \
	jax.config.update('jax_platforms','cpu'); \
	import __graft_entry__ as g; g.dryrun_multichip(8)"

smoke:
	python -m comorag_tpu.cli.run --base_path dataset/moonlantern \
	  --llm_name fake --embedding_model_name hash \
	  --output_dir result/moonlantern --save_dir outputs/moonlantern

eval-smoke:
	python -m comorag_tpu.eval.qa_eval result/moonlantern
