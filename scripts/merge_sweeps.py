"""Merge partial sweep jsons (a crashed/restarted driver leaves several)
into one canonical per-round artifact, preferring successful entries.

Usage: python scripts/merge_sweeps.py OUT.json IN1.json IN2.json ...
"""

import json
import sys


def main():
    out_path, ins = sys.argv[1], sys.argv[2:]
    merged, sf = {}, None
    for path in ins:
        try:
            with open(path) as f:
                d = json.load(f)
        except Exception as e:  # noqa: BLE001
            print(f"# skip {path}: {e}", file=sys.stderr)
            continue
        sf = d.get("sf", sf)
        for q, r in d.get("queries", {}).items():
            cur = merged.get(q)
            better = (cur is None
                      or ("ms" in r and "ms" not in cur)
                      or ("ms" in r and "ms" in cur
                          and r.get("match") and not cur.get("match")))
            if better:
                merged[q] = r
    ok = sum(1 for r in merged.values()
             if "ms" in r and r.get("match") is not False)
    doc = {"sf": sf, "ok": ok, "total": len(merged),
           "queries": {k: merged[k] for k in
                       sorted(merged, key=lambda x: int(x))}}
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"ok": ok, "total": len(merged), "out": out_path}))


if __name__ == "__main__":
    main()
