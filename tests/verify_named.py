"""Run specific registry queries vs the DuckDB oracle: python tests/verify_named.py name1 name2 ... [--sf dir]"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from gaia_spark.session import get_session  # noqa: E402
import __spark_entry__ as E  # noqa: E402
from oracle_harness import compare, duck_run  # noqa: E402

args = sys.argv[1:]
sf_dir = "/root/testdata/sf0.001"
if "--sf" in args:
    i = args.index("--sf")
    sf_dir = args[i + 1]
    args = args[:i] + args[i + 2:]

spark = get_session(
    "local[8]",
    confs={"spark.sql.shuffle.partitions": "16", "spark.driver.memory": "8g"},
)
qs, os_ = E.queries(), E.oracle_sql()
fails = []
for name in args:
    try:
        sdf = qs[name](spark, sf_dir)
        if name in os_:
            compare(sdf, duck_run(os_[name], sf_dir))
            print("OK(hash)", name, flush=True)
        else:
            assert sdf.count() >= 0
            print("OK(rows)", name, flush=True)
    except Exception as e:  # noqa: BLE001
        fails.append(name)
        print("FAIL", name, repr(e)[:500], flush=True)
print("FAILS:", fails)
sys.exit(1 if fails else 0)
