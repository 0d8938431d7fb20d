import hashlib
import json
import sys

tree = sys.argv[1]
out_path = sys.argv[2]
sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"
sys.path.insert(0, tree)
from zseq.session import get_spark  # noqa: E402
from zseq import queries as Q  # noqa: E402

spark = get_spark("qhash")
res = {}
for name, fn in Q.queries().items():
    try:
        df = fn(spark, sf)
        rows = sorted(repr(tuple(r)) for r in df.collect())
        h = hashlib.md5("\n".join(rows).encode()).hexdigest()
        res[name] = {"rows": len(rows), "hash": h,
                     "schema": df.schema.json()}
    except Exception as e:  # noqa: BLE001
        res[name] = {"err": repr(e)[:300]}
    print(name, res[name].get("rows"), res[name].get("hash", "ERR"),
          flush=True)
json.dump(res, open(out_path, "w"), indent=1)
