#!/usr/bin/env python3
"""Differential-test fixture generator: run the REFERENCE's
merge_uniprot_matches (read-only, as a behavioral oracle — same role
DuckDB plays for the SQL queries) on deterministic random inputs and
dump (input, expected-output) pairs as JSON for MatchMergeDifferentialSpec.

Usage: python3 tools/gen_matchmerge_fixture.py > src/test/resources/matchmerge_fixture.json
"""
import importlib.util
import json
import random
import sys
import types

# Load the reference's matches.py standalone, stubbing its DB/storage
# imports (we only call the pure functions).
def load_reference_matches():
    for name, attrs in [
        ("oracledb", {}),
        ("interpro7dw", {}),
        ("interpro7dw.utils", {"logger": types.SimpleNamespace(info=lambda *a: None)}),
        ("interpro7dw.utils.oracle", {"lob_as_str": lambda *a: None}),
        ("interpro7dw.utils.store", {"BasicStore": object, "KVStoreBuilder": object,
                                     "KVStore": object}),
        ("interpro7dw.interpro.oracle", {}),
    ]:
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod

    # entries.py also has heavy imports; pull just the constants from source
    ent_src = open("/root/reference/interpro7dw/interpro/oracle/entries.py").read()
    ns = {}
    for line in ent_src.splitlines():
        if line.startswith(("REPR_DOM_DATABASES", "REPR_FAM_DATABASES")) or \
           line.startswith(("REPR_DOM_TYPES", "REPR_FAM_TYPES")) or \
           (ns and not line.startswith((" ", "#")) and "=" not in line and line.strip()):
            pass
    # simpler: exec only the constant lines
    const_lines = []
    grab = False
    for line in ent_src.splitlines():
        if line.startswith(("REPR_DOM_DATABASES", "REPR_DOM_TYPES",
                            "REPR_FAM_DATABASES", "REPR_FAM_TYPES")):
            grab = True
        if grab:
            const_lines.append(line)
            if line.rstrip().endswith(("]", "}")):
                grab = False
    exec("\n".join(const_lines), ns)

    ent_mod = types.ModuleType("interpro7dw.interpro.oracle.entries")
    for k in ("REPR_DOM_DATABASES", "REPR_DOM_TYPES",
              "REPR_FAM_DATABASES", "REPR_FAM_TYPES"):
        setattr(ent_mod, k, ns[k])
    ent_mod.load_entries = lambda *a: None
    ent_mod.load_signatures = lambda *a: None
    sys.modules["interpro7dw.interpro.oracle.entries"] = ent_mod

    spec = importlib.util.spec_from_file_location(
        "interpro7dw.interpro.oracle.matches",
        "/root/reference/interpro7dw/interpro/oracle/matches.py")
    m = importlib.util.module_from_spec(spec)
    sys.modules["interpro7dw.interpro.oracle.matches"] = m
    spec.loader.exec_module(m)
    return m, ns

def main():
    m, consts = load_reference_matches()
    rng = random.Random(20260812)
    dom_dbs = consts["REPR_DOM_DATABASES"]
    fam_dbs = consts["REPR_FAM_DATABASES"]

    cases = []
    for case_id in range(240):
        # later cases skew adversarial: many overlapping domains,
        # duplicate locations, single-residue fragments
        adversarial = case_id >= 40  # cases 40+ adversarial
        n_sigs = rng.randint(1, 8)
        signatures = {}
        entries = {}
        raw = []   # rows for the Scala side
        matches = []  # tuples for the reference
        for si in range(n_sigs):
            acc = f"SIG{case_id}_{si}"
            kind_roll = rng.random()
            if kind_roll < 0.45:
                database = rng.choice(dom_dbs)
                sig_type = rng.choice(sorted(consts["REPR_DOM_TYPES"]))
                kind, rank = "domain", dom_dbs.index(database)
            elif kind_roll < 0.8:
                database = rng.choice(fam_dbs)
                sig_type = "family"
                kind, rank = "family", fam_dbs.index(database)
                if database == "panther":
                    # PANTHER family accessions are PTHRnnnnn; their hits
                    # may carry subfamily models (PTHRnnnnn:SFnn)
                    acc = f"PTHR{case_id}{si}"
            else:
                database = "mobidblt"   # not in either priority list
                sig_type = "region"
                kind, rank = "region", 0
            entry = f"IPR{case_id}_{si % 3}" if rng.random() < 0.5 else None
            signatures[acc] = {
                "database": database.upper(), "type": sig_type.capitalize(),
                "name": acc, "short_name": acc, "evidence": "e",
                "entry": entry,
            }
            if entry and entry not in entries:
                entries[entry] = {"name": entry, "short_name": entry,
                                  "type": "Domain", "parent": None}
            n_locs = rng.randint(1, 6 if adversarial else 3)
            dup_frags = None
            for _ in range(n_locs):
                n_frags = rng.randint(1, 4 if adversarial else 3)
                frags = []
                for _ in range(n_frags):
                    if adversarial and rng.random() < 0.3:
                        start = rng.randint(1, 60)   # force deep overlap
                        end = start + rng.choice([0, 1, 100])
                    else:
                        start = rng.randint(1, 400)
                        end = start + rng.randint(0, 150)
                    frags.append({"start": start, "end": end,
                                  "dc-status": "CONTINUOUS"})
                if adversarial and dup_frags and rng.random() < 0.25:
                    frags = [dict(f) for f in dup_frags]  # exact duplicate location
                dup_frags = frags
                frags.sort(key=lambda f: (f["start"], f["end"]))
                score = round(rng.uniform(0, 100), 3)
                # model accession: usually the signature, sometimes a
                # distinct model name, and for PANTHER families often a
                # subfamily model (which the reference requires to be
                # present in the signatures dict, matches.py:359-363)
                model_roll = rng.random()
                if acc.startswith("PTHR") and model_roll < 0.5:
                    model = f"{acc}:SF{rng.randint(1, 3)}"
                    if model not in signatures:
                        signatures[model] = {
                            "database": "PANTHER", "type": "Family",
                            "name": f"name of {model}", "short_name": model,
                            "evidence": "e", "entry": None,
                        }
                elif model_roll < 0.15:
                    model = f"{acc}.m1"
                else:
                    model = None   # reference falls back to the signature
                matches.append((acc, model, score, frags))
                raw.append({
                    "signatureAcc": acc, "entryAcc": entry, "kind": kind,
                    "rank": rank, "score": score, "model": model,
                    "fragments": [[f["start"], f["end"]] for f in frags],
                })

        merged = m.merge_uniprot_matches(matches, signatures, entries)
        expected = []
        for match in merged:
            is_entry = match["database"] == "INTERPRO"
            locs = []
            for loc in match["locations"]:
                frags = loc["fragments"]
                sub = loc.get("subfamily")
                locs.append({
                    "fragments": [[f["start"], f["end"]] for f in frags],
                    "representative": bool(loc.get("representative", False)),
                    "model": loc.get("model"),
                    "score": loc.get("score"),
                    "subfamily": sub["accession"] if sub else None,
                })
            expected.append({"acc": match["accession"], "isEntry": is_entry,
                             "locations": locs})
        cases.append({"proteinAcc": f"P{case_id}", "raw": raw,
                      "expected": expected})

    json.dump({"cases": cases}, sys.stdout, indent=1, sort_keys=True)

if __name__ == "__main__":
    main()
