"""Build + execute examples/overview.ipynb — the onboarding notebook.

Mirrors the reference's canonical tutorial flow (waveome_overview.ipynb:
simulate 3-outcome longitudinal data -> GPSearch -> penalized
optimization -> component plots -> individual posterior means ->
importance heatmap) using this package's API, and EXECUTES it so the
committed artifact carries rendered figures.

Run on the chip (the 3-outcome penalized fit is seconds there):
    python tools/gen_overview_nb.py
CPU fallback: SIM_PLATFORM=cpu python tools/gen_overview_nb.py
"""

import os
import sys

import nbformat as nbf

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "examples", "overview.ipynb")


def md(src):
    return nbf.v4.new_markdown_cell(src)


def code(src):
    return nbf.v4.new_code_cell(src)


CELLS = [
    md("""# waveome_tpu overview

`waveome_tpu` models longitudinal 'omics outcomes with Gaussian
processes over automatically selected covariance structures — a
TPU-native rebuild of the waveome workflow. This tutorial walks the
canonical path (the counterpart of the reference's
`waveome_overview.ipynb`): simulate a small longitudinal study, run the
penalized kernel selection over every outcome at once, then inspect
what was found with component plots, per-individual posteriors, and the
feature-importance heatmap."""),
    code("""import os

if os.environ.get("SIM_PLATFORM") == "cpu":
    # CPU execution (CI / no chip): the axon TPU-tunnel plugin
    # overrides JAX_PLATFORMS, so drop its factory before first use
    from jax._src import xla_bridge as _xb

    _xb._backend_factories.pop("axon", None)
    import jax

    jax.config.update("jax_platforms", "cpu")

%matplotlib inline
import numpy as np
import pandas as pd
import matplotlib.pyplot as plt

from waveome_tpu import GPSearch"""),
    md("""## Simulate longitudinal data

100 individuals, ~5 visits each, a binary `female` covariate, and three
outcomes with known drivers: `outcome1` is a smooth function of time
alone, `outcome2` is a female-by-time interaction, and `outcome3` mixes
a linear time trend with individual-level offsets."""),
    code("""rng = np.random.default_rng(9102)
n_people, n_obs = 100, 5
total = n_people * n_obs

person = np.repeat(np.arange(n_people), n_obs)
time = rng.uniform(0.0, 12.0, size=total)
female = np.repeat(rng.choice(["N", "Y"], size=n_people), n_obs)

out1 = np.sin(time) + rng.normal(scale=0.1, size=total)
out2 = (female == "Y") * np.cos(time) + rng.normal(scale=0.1, size=total)
out3 = (0.5 * time
        + np.repeat(rng.normal(scale=1.0, size=n_people), n_obs)
        + rng.normal(scale=0.1, size=total))

df = pd.DataFrame({
    "person_id": person, "time": time, "female": female,
    "outcome1": out1, "outcome2": out2, "outcome3": out3,
}).sort_values(["person_id", "time"])
df.head()"""),
    code("""fig, axs = plt.subplots(1, 3, figsize=(12, 3), sharex=True)
for ax, o in zip(axs, ["outcome1", "outcome2", "outcome3"]):
    for fval, color in (("N", "tab:blue"), ("Y", "tab:orange")):
        sub = df[df.female == fval]
        ax.scatter(sub.time, sub[o], s=6, alpha=0.4, color=color,
                   label=f"female={fval}")
    ax.set_title(o)
    ax.set_xlabel("time")
axs[0].legend()
plt.tight_layout()
plt.show()"""),
    md("""## Penalized kernel selection

`GPSearch` ingests the design and outcomes (factorizing categoricals and
standardizing internally). `penalized_optimization` fits every outcome
against the saturated additive kernel under a horseshoe penalty — on a
TPU all outcomes fit as one batched program — then prunes components and
computes per-component importances."""),
    code("""gps = GPSearch(
    X=df[["person_id", "time", "female"]],
    Y=df[["outcome1", "outcome2", "outcome3"]],
    unit_col="person_id",
    categorical_vars=["female"],
    outcome_likelihood="gaussian",
)
gps.penalized_optimization(
    random_seed=9102,
    kernel_options={
        "second_order_numeric": False,
        "unit_numeric_interactions": False,
        "categorical_numeric_interactions": True,
        "kerns": ["squared_exponential", "linear"],
    },
)"""),
    code("""# the fitted model handle for outcome1: selected structure +
# per-component importances
m = gps.models["outcome1"]
print("kernel:", m.kernel_name)
print("importances:", m.component_importance_dict)"""),
    md("""## Component plots

`plot_parts` decomposes each outcome's fit into its selected additive
components (the panels mirror the reference's `pred_kernel_parts`):
`outcome1` should show a single smooth time component; `outcome2` a
female-by-time interaction."""),
    code("""gps.plot_parts(out_label="outcome1", x_axis_label="time",
               figsize=(10, 3))
plt.show()"""),
    code("""gps.plot_parts(out_label="outcome2", x_axis_label="time",
               figsize=(10, 3))
plt.show()"""),
    md("""## Individual posterior means

`plot_marginal` draws the posterior mean over time; `unit_label`
conditions on one individual's unit component."""),
    code("""fig, axs = plt.subplots(3, 1, figsize=(4.5, 6), sharex=True)
for i, pid in enumerate([0, 1, 2]):
    gps.plot_marginal(out_label="outcome2", x_axis_label="time",
                      unit_label=pid, ax=axs[i])
    axs[i].set_title(f"person_id: {pid}")
plt.tight_layout()
plt.show()"""),
    md("""## Feature importance across outcomes

The heatmap summarizes which features drive which outcomes during the
selection (deviance-explained shares per kernel feature)."""),
    code("""gps.plot_heatmap(var_cutoff=0, figsize=(6, 3))
plt.show()"""),
    code("""# subset to a single feature of interest
gps.plot_heatmap(var_cutoff=0, feature_name="person_id",
                 figsize=(6, 3), cluster=False)
plt.show()"""),
    md("""That is the core loop: load a frame, run one selection call over
every outcome, and read the structure back through plots and importance
tables. For the greedy structure search (`run_search`), count
likelihoods, multi-output LMC models, and the checkpointed sweep driver
for hundreds of outcomes, see `docs/` and `examples/`."""),
]


def main():
    sys.path.insert(0, REPO)
    nb = nbf.v4.new_notebook()
    nb.cells = CELLS
    nb.metadata["kernelspec"] = {
        "name": "python3", "display_name": "Python 3",
        "language": "python",
    }

    from nbclient import NotebookClient

    client = NotebookClient(
        nb, timeout=1200, kernel_name="python3",
        resources={"metadata": {"path": REPO}},
    )
    client.execute()
    with open(OUT, "w") as f:
        nbf.write(nb, f)
    n_out = sum(len(c.get("outputs", [])) for c in nb.cells
                if c.cell_type == "code")
    n_img = sum(
        1 for c in nb.cells if c.cell_type == "code"
        for o in c.get("outputs", [])
        if "image/png" in o.get("data", {})
    )
    print(f"wrote {OUT}: {len(nb.cells)} cells, {n_out} outputs, "
          f"{n_img} figures")


if __name__ == "__main__":
    main()
