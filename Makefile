.PHONY: test native bench docs clean

test:
	python -m pytest tests/ -q

native:
	$(MAKE) -C native

bench:
	python bench.py

docs:
	python tools/gen_parameter_readmes.py
	python tools/gen_docs.py

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
