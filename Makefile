# Developer entry points. See CLAUDE.md for environment gotchas.
.PHONY: test test-all bench bench-boot bench-scaling native clean

test:
	python -m pytest tests/ -q

test-all:
	python -m pytest tests/ -q -m ""

bench:
	python bench.py

bench-boot:
	python bench_boot.py

bench-scaling:
	python bench_scaling.py

native:
	$(MAKE) -C native

clean:
	$(MAKE) -C native clean
