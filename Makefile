# Developer entry points.

.PHONY: test bench natives clean

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

natives:
	$(MAKE) -C native

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
