#!/usr/bin/env python3
"""Differential-test fixture generator for the 8-rank taxonomy trees:
execute the REFERENCE's own tree-construction logic (the main-rank
lineage projection and the per-entry tree build inside
interpro/xrefs/entries.py, plus _format_node) on deterministic
synthetic taxonomies, and dump (taxa, hits, expected canonical tree)
cases for TaxaTreeDifferentialSpec.

The reference source is SLICED and exec'd at generation time — no
reference code lives in this repository; only the resulting
input/expected JSON does (same role the DuckDB oracle plays for SQL).

Usage: python3 tools/gen_taxatree_fixture.py > src/test/resources/taxatree_fixture.json
"""
import json
import random
import sys

REF = "/root/reference/interpro7dw/interpro/xrefs/entries.py"
LINES = open(REF).read().splitlines()


def find(pred, start=0):
    for i in range(start, len(LINES)):
        if pred(LINES[i]):
            return i
    raise SystemExit(f"marker not found after line {start}")


def dedent(block):
    keep = [l for l in block if l.strip()]
    ind = min(len(l) - len(l.lstrip()) for l in keep)
    return "\n".join(l[ind:] if l.strip() else "" for l in block)


# MAIN_RANKS constant
i0 = find(lambda l: l.startswith("MAIN_RANKS"))
i1 = find(lambda l: l.rstrip() == "]", i0)
main_ranks_src = "\n".join(LINES[i0:i1 + 1])

# Block A: main-rank lineage projection (for info in taxa.values(): ...)
a0 = find(lambda l: "for info in taxa.values():" in l)
a1 = find(lambda l: 'info["main_ranks"] = lineage' in l, a0)
block_a = dedent(LINES[a0:a1 + 1])

# Block B: per-entry tree construction through the root wrap
b0 = find(lambda l: l.strip() == "all_taxa = {}")
b1 = find(lambda l: '"children": children' in l, b0)
# the two closing braces of the tree/taxa dicts
b2 = b1
closes = 0
while closes < 2:
    b2 += 1
    if LINES[b2].strip() == "}":
        closes += 1
block_b = dedent(LINES[b0:b2 + 1])

# _format_node
f0 = find(lambda l: l.startswith("def _format_node"))
f1 = find(lambda l: l.strip().startswith("return"), f0)
format_node_src = "\n".join(LINES[f0:f1 + 1])

base_ns = {}
exec(main_ranks_src, base_ns)
exec(format_node_src, base_ns)
MAIN_RANKS = base_ns["MAIN_RANKS"]


def run_reference(taxa_rows, hits):
    """taxa_rows: [(id, parent|None, rank, name)]; hits: {taxon_id: n}."""
    taxa = {}
    for tid, parent, rank, name in taxa_rows:
        taxa[tid] = {"parent": parent, "rank": rank, "sci_name": name,
                     "lineage": [tid]}
    for tid, info in taxa.items():
        p = info["parent"]
        while p is not None:
            info["lineage"].append(p)
            p = taxa[p]["parent"]
        info["lineage"] = list(reversed(info["lineage"]))

    ns = dict(base_ns)
    ns["taxa"] = taxa
    exec(block_a, ns)
    ns["entry_xrefs"] = {"taxa": dict(hits)}
    exec(block_b, ns)
    return ns["entry_xrefs"]["taxa"]["tree"]


def canon(node):
    return {
        "children": sorted((canon(c) for c in node["children"]),
                           key=lambda c: c["id"]),
        "id": node["id"],
        "name": node["name"],
        "proteins": node["proteins"],
        "rank": node["rank"],
        "species": node["species"],
    }


def main():
    rnd = random.Random(20260812)
    extra_ranks = ["no rank", "subspecies", "strain", "clade"]
    names = ["Plain", 'Str "quoted"', "Back\\slash", "x' y", "alpha beta"]
    cases = []
    for case_i in range(72):
        n_nodes = rnd.randint(3, 18)
        rows = []
        ids = []
        for j in range(n_nodes):
            tid = f"T{case_i}_{j}"
            parent = rnd.choice(ids) if ids else None
            if j == 0:
                rank = "domain" if rnd.random() < 0.8 else "no rank"
            else:
                rank = rnd.choice(MAIN_RANKS + extra_ranks)
            name = rnd.choice(names) + f" {j}"
            rows.append((tid, parent, rank, name))
            ids.append(tid)
        # hits over random taxa, 1-3 entries
        hits_per_entry = {}
        for e in range(rnd.randint(1, 3)):
            entry = f"E{e}"
            chosen = rnd.sample(ids, rnd.randint(1, min(5, len(ids))))
            hits_per_entry[entry] = {t: rnd.randint(1, 9) for t in chosen}
        expected = {}
        for entry, hits in sorted(hits_per_entry.items()):
            expected[entry] = json.dumps(canon(run_reference(rows, hits)),
                                         sort_keys=True,
                                         separators=(",", ":"))
        cases.append({
            "taxa": [{"id": t, "parent": p, "rank": r, "name": n}
                     for t, p, r, n in rows],
            "hits": [{"entry": e, "taxon_id": t, "n": c}
                     for e, hs in sorted(hits_per_entry.items())
                     for t, c in sorted(hs.items())],
            "expected": expected,
        })
    json.dump({"cases": cases}, sys.stdout, indent=1)


if __name__ == "__main__":
    main()
