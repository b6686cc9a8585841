# Developer entry points. See CLAUDE.md for the full guide.

.PHONY: test test-tpu bench dryrun demo-mnist demo-text lint

test:
	python -m pytest tests/ -x -q

test-tpu:  ## ops/kernel tests compiled on the real TPU
	TDM_TEST_BACKEND=tpu python -m pytest tests/test_ops.py -q

bench:
	python bench.py

dryrun:  ## multi-chip sharding validation on a virtual 8-device CPU mesh
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
		python __graft_entry__.py

demo-mnist:  ## quick end-to-end train + sample (synthetic fallback data)
	TDM_DATA_LIMIT=2048 python -m tinydiffusionmodels_tpu.mnist \
		--train --epochs 2 --batch_size 128 --no_epoch_samples
	python -m tinydiffusionmodels_tpu.mnist --sample --sampler dpm++ --steps 20

demo-text:  ## quick end-to-end text train + sample (builtin corpus)
	TDM_DATA_LIMIT=100000 python -m tinydiffusionmodels_tpu.shakespeare \
		--train --epochs 2 --batch_size 64 --use_learned_embeddings \
		--embed_dim 256 --model_id char
	python -m tinydiffusionmodels_tpu.shakespeare --sample --n 2 \
		--use_learned_embeddings --embed_dim 256 --model_id char --clamp
