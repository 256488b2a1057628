"""spark-submit primary application file.

The reference ships as a single Go binary (`exec/exec.go`); the Spark
deployment unit is this launcher plus the package zip:

    cd /root/repo && python -m zipfile -c pholcus_spark.zip pholcus_spark
    spark-submit --master <cluster> --py-files pholcus_spark.zip \
        tools/submit_crawl.py --store /data/crawl1 --seeds seeds.txt

All flags are `pholcus_spark.__main__`'s; the session inherits the
submitted master/executor config (pass --cores only to force local[N]).
Re-running with the same --store resumes from the last committed
snapshot. Exercised end-to-end by tests/test_spark_submit.py.
"""

from pholcus_spark.__main__ import main

if __name__ == "__main__":
    raise SystemExit(main())
