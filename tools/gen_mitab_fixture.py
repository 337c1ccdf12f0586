#!/usr/bin/env python3
"""Differential-test fixture generator: run the REFERENCE's IntAct
MITAB parser (interpro7dw/intact.py, read-only, as a behavioral
oracle — same role DuckDB plays for the SQL queries) over a
deterministic synthetic MITAB file covering every extraction branch,
and dump (lines, expected flattened rows) as JSON for
MitabDifferentialSpec.

Usage: python3 tools/gen_mitab_fixture.py > src/test/resources/mitab_fixture.json
"""
import importlib.util
import json
import random
import tempfile

spec = importlib.util.spec_from_file_location(
    "ref_intact", "/root/reference/interpro7dw/intact.py")
ref = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ref)

rng = random.Random(20260813)


def ids_field(kind, i):
    if kind == 0:
        return f'uniprotkb:P{i:05d}|intact:EBI-{i * 3}'
    if kind == 1:
        return f'UniProtKB:Q{i:05d}'          # case-insensitive prefix
    if kind == 2:
        return f'UNIPROTKB:o{i:05d}'          # acc charset rejects lowercase
    if kind == 3:
        return f'chebi:"CHEBI:{i}"'           # no uniprotkb -> None
    return f'intact:EBI-{i * 7}'              # intact-only -> None


def alias_field(kind, i):
    if kind == 0:
        return f'uniprotkb:gn{i}(gene name)|psi-mi:nm{i}(display_long)'
    if kind == 1:
        return f'PSI-MI:longName{i}(display_long)'  # case prefix, uppercased
    if kind == 2:
        return f'uniprotkb:gene{i}(gene name)'      # fallback alias
    if kind == 3:
        return '-'                                  # no name -> None
    return f'psi-mi:nm{i}(display_short)'           # wrong qualifier


def types_field(kind):
    if kind == 0:
        return 'psi-mi:"MI:0326"(protein)'
    if kind == 1:  # two values -> type None
        return 'psi-mi:"MI:0326"(protein)|psi-mi:"MI:0328"(small molecule)'
    if kind == 2:  # single value but non-matching shape -> None
        return 'MI:0328(small molecule)'
    return 'PSI-MI:"MI:0326"(peptide)'               # case-insensitive


def pubs_field(kind, i):
    if kind == 0:
        return f'pubmed:{10000 + i}|mint:MINT-{i}'
    if kind == 1:
        return f'PUBMED:{20000 + i}'
    return f'doi:10.1000/x{i}'                       # no pmid -> dropped


def inter_field(kind, i):
    if kind == 0:
        return f'intact:EBI-{i}|imex:IM-{i % 97}'
    if kind == 1:
        return f'InTaCt:EBI-{i + 500000}'
    return f'imex:IM-{i}'                            # no intact id -> dropped


def feat_field(kind, i):
    a, b = i % 300, (i * 3) % 300
    if kind == 0:
        return f'binding-associated region:IPR{a:06d}(positions)'
    if kind == 1:  # two IPRs, one duplicated vs f36's
        return (f'sufficient binding region:IPR{b:06d}'
                f'|binding-associated region:IPR{a:06d}')
    if kind == 2:
        return 'mutation decreasing interaction:-'
    return '-'


def line(i, dup_of=None):
    if dup_of is not None:
        return dup_of                 # byte-identical duplicate line
    def pick(n, valid):
        # 80% a valid branch, 20% any branch (droppers included)
        return rng.choice(valid) if rng.random() < 0.8 else rng.randrange(n)
    f = ['-'] * 42
    f[0] = ids_field(pick(5, [0, 1, 2]), i)
    f[1] = ids_field(pick(5, [0, 1, 2]), i + 1)
    f[4] = alias_field(pick(5, [0, 1, 2]), i)
    f[5] = alias_field(pick(5, [0, 1, 2]), i + 1)
    f[8] = pubs_field(pick(3, [0, 1]), i)
    f[13] = inter_field(pick(3, [0, 1]), i)
    f[20] = types_field(pick(4, [0, 3]))
    f[21] = types_field(pick(4, [0, 3]))
    f[36] = feat_field(pick(4, [0, 1]), i)
    f[37] = feat_field(pick(4, [0, 1]), i + 1)
    return '\t'.join(f)


lines = []
for i in range(400):
    lines.append(line(i))
    if i % 17 == 0:               # exact duplicate -> dedup on intact id
        lines.append(line(i, dup_of=lines[-1]))

with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as fh:
    fh.write('\t'.join(f'col{j}' for j in range(42)) + '\n')  # header
    fh.write('\n'.join(lines) + '\n')
    path = fh.name

entries = ref.get_interpro_interactions(path)
rows = sorted(
    (acc, o["intact_id"], o["pubmed_id"],
     o["molecule_1"]["accession"], o["molecule_1"]["identifier"],
     o["molecule_1"]["type"],
     o["molecule_2"]["accession"], o["molecule_2"]["identifier"],
     o["molecule_2"]["type"])
    for acc, objs in entries.items() for o in objs)

assert rows, "degenerate fixture: reference produced no interactions"
print(json.dumps({"lines": lines, "expected": rows}, indent=1))
