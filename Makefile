.PHONY: test oracle bench scaling pyfiles audit smoke

test:
	python -m pytest tests/ -x -q

oracle:
	python scripts/check_oracle.py /root/testdata/sf0.01

bench:
	python bench.py

scaling:
	python scripts/scaling_bench.py 600000

pyfiles:
	rm -f kgpipe_spark.zip
	zip -qr kgpipe_spark.zip kgpipe_spark

smoke:
	python jobs/run_pipeline.py --master 'local[8]' --rows 30000

audit:
	python scripts/plan_audit.py
