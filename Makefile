# kjarni-tpu developer entry points

.PHONY: test native bench bench-all parity loadtest clean

test:
	python -m pytest tests/ -q

native:
	$(MAKE) -C native

bench:
	python bench.py

bench-all:
	python bench.py --metric embed
	python bench.py --metric decode
	python bench.py --metric decode-int8
	python bench.py --metric whisper
	python bench.py --metric summarize

parity:
	python scripts/tpu_parity_check.py

loadtest:
	python scripts/serve_load_test.py --model $(MODEL)

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
