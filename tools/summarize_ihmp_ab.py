"""Summarize the iHMP fidelity A/B (tools/run_ihmp_ab.sh): does the
cheap search config (depth 2, 1 restart) select the same structures as
the reference-default config (depth 5 + early stopping, 3 restarts)?

Writes examples/output/ihmp_ab/summary.json and prints the table.
"""

import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AB = os.path.join(REPO, "examples", "output", "ihmp_ab")


def canon(name):
    """Order-insensitive canonical form of a kernel-structure name."""
    if not name:
        return ""
    comps = ["*".join(sorted(c.split("*"))) for c in name.split("+")]
    return "+".join(sorted(comps))


def feats(name):
    """The set of covariates a structure uses (bracket indices/names)."""
    return set(re.findall(r"\[([^\]]+)\]", name or ""))


def main():
    arms = {}
    for arm in ("cheap", "ref"):
        p = os.path.join(AB, arm, "search_results.json")
        with open(p) as f:
            arms[arm] = json.load(f)
    common = sorted(
        set(arms["cheap"]["best_models"]) & set(arms["ref"]["best_models"])
    )
    n = len(common)
    same_struct = same_feats = 0
    diffs = []
    for o in common:
        a = arms["cheap"]["best_models"][o]
        b = arms["ref"]["best_models"][o]
        if canon(a) == canon(b):
            same_struct += 1
            same_feats += 1
        elif feats(a) == feats(b):
            same_feats += 1
            diffs.append({"outcome": o, "cheap": a, "ref": b,
                          "same_features": True})
        else:
            diffs.append({"outcome": o, "cheap": a, "ref": b,
                          "same_features": False})
    out = {
        "n_common": n,
        "identical_structure": same_struct,
        "identical_structure_frac": round(same_struct / max(n, 1), 3),
        "identical_feature_set": same_feats,
        "identical_feature_set_frac": round(same_feats / max(n, 1), 3),
        "cheap_config": arms["cheap"].get("config"),
        "ref_config": arms["ref"].get("config"),
        "cheap_wall_minutes": arms["cheap"].get("wall_minutes"),
        "ref_wall_minutes": arms["ref"].get("wall_minutes"),
        "divergent": diffs,
    }
    with open(os.path.join(AB, "summary.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: v for k, v in out.items() if k != "divergent"},
                     indent=2))
    print(f"{len(diffs)} divergent outcomes "
          f"(see {os.path.join(AB, 'summary.json')})")


if __name__ == "__main__":
    main()
