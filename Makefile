.PHONY: test bench verify plans lint

test:
	python -m pytest tests/ -q

bench:
	python bench.py

verify:
	cd /tmp && python $(CURDIR)/tools/driver_sim.py

plans:
	python tools/explain_audit.py

lint:
	python -m compileall -q cc2dataset_spark tests bench.py __spark_entry__.py
