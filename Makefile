# Developer entry points (see README.md)

.PHONY: test bench baseline scaling native clean

test:
	python -m pytest tests/ -q

# headline SpMM fwd+bwd edges/s/chip (runs on the default jax platform)
bench:
	python bench.py

# accuracy baseline: torch-CPU oracle vs tpugraph on the pinned task
baseline:
	JAX_PLATFORMS=cpu python scripts/baseline_parity.py --scale dbp5k

# edge-partitioned scaling ladder (CPU sim here; pod-ready via --platform tpu)
scaling:
	JAX_PLATFORMS=cpu python scripts/scaling_bench.py --shards 1,2,4,8 --epochs 10 \
	  --n-ent 5000 --n-triples 25000

native:
	$(MAKE) -C tpugraph/native

clean:
	$(MAKE) -C tpugraph/native clean
	rm -rf .jax_cache
