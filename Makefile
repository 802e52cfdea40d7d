.PHONY: test test-fast bench docs lint native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -k "not Solve and not Batched and not Optimization"

bench:
	python bench.py

native:
	python -c "from anap3_tpu.utils.native import vts_codec; print('native codec:', vts_codec() is not None)"

docs:
	sphinx-build -b html docs/source docs/build/html

clean:
	rm -rf build .pytest_cache outputs hydra_outputs
	find . -name __pycache__ -type d -exec rm -rf {} +
