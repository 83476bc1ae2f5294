# biomedkg_tpu developer targets (reference Makefile installs CUDA wheels;
# here the stack is baked in — targets cover native build, tests, bench).

.PHONY: native test test-fast bench smoke profile clean

native:
	python -c "from biomedkg_tpu.sampling import native; \
	           lib = native.get_lib(); \
	           print('native sampler:', 'OK' if lib else 'UNAVAILABLE')"

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

smoke:
	bash scripts/test/test_kge.sh
	bash scripts/test/test_gcl.sh
	bash scripts/test/test_dpi.sh

clean:
	rm -rf ckpt log data/embed data/gcl_embed data/kge_embed \
	       biomedkg_tpu/sampling/native/*.so

profile:
	python scripts/profile_step.py
