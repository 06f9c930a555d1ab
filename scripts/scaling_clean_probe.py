"""Scaling-only probe: window-paired 2->8 build pairs with immediate
hw certification, hunting a clean (hw >= 0.95) window."""
import json, os, sys
sys.path.insert(0, "/root/repo")
import bench
import ocaml_lucene_spark as _pkg

n_lo, n_hi = 2, 8
workdir = f"/tmp/olspark_bench_{_pkg.__version__}_100000"
corpus = os.path.join(workdir, "c", "webtext")
assert os.path.isdir(corpus), "bench corpus missing"
out = []
for attempt in range(6):
    lo = bench.build_at(n_lo, corpus, workdir)
    hi = bench.build_at(n_hi, corpus, workdir)
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / (n_hi / n_lo)
    cal = bench.calibrate_cpu(n_lo, n_hi)
    cn = None
    if lo.get("cores_used") and hi.get("cores_used"):
        cn = (hi["docs_per_sec"] / lo["docs_per_sec"]) / (hi["cores_used"] / lo["cores_used"])
    rec = {"attempt": attempt, "eff": round(eff, 3),
           "cn_eff": round(cn, 3) if cn else None,
           "hw": cal["hw_efficiency"],
           "lo_sec": lo["elapsed_sec"], "hi_sec": hi["elapsed_sec"],
           "cores": [lo.get("cores_used"), hi.get("cores_used")]}
    out.append(rec)
    print(json.dumps(rec), flush=True)
    if cal["hw_efficiency"] >= 0.95 and eff >= 0.75:
        print("CLEAN WINDOW HIT", flush=True)
        break
json.dump(out, open("/tmp/scaling_probe.json", "w"), indent=1)
