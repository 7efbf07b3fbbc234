"""Driver-simulation slice runner: python tests/driver_sim_slice.py K N [sf_dir]

Runs entry() (slice 0 only) plus every K-of-N slice of the sorted
queries()/oracle_sql() registry against the DuckDB oracle — the /verify
recipe, sharded so each shard fits a bounded wall clock.
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from gaia_spark.session import get_session  # noqa: E402
import __spark_entry__ as E  # noqa: E402
from oracle_harness import compare, duck_run  # noqa: E402

k, n = int(sys.argv[1]), int(sys.argv[2])
sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"

spark = get_session(
    "local[8]",
    confs={"spark.sql.shuffle.partitions": "16", "spark.driver.memory": "8g"},
)
if k == 0:
    df = E.entry(spark)
    assert df.count() > 0
    print("OK entry", flush=True)
qs, os_ = E.queries(), E.oracle_sql()
names = sorted(qs)[k::n]
fails = []
for name in names:
    try:
        sdf = qs[name](spark, sf_dir)
        if name in os_:
            compare(sdf, duck_run(os_[name], sf_dir))
        else:
            assert sdf.count() >= 0
        print("OK", name, flush=True)
    except Exception as e:  # noqa: BLE001
        fails.append(name)
        print("FAIL", name, repr(e)[:300], flush=True)
print(f"DONE slice {k}/{n}: {len(names) - len(fails)}/{len(names)} ok; fails={fails}", flush=True)
sys.exit(1 if fails else 0)
