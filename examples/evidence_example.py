"""Evidence estimation with honest error bars.

Demonstrates the layered evidence-error toolkit on the 4-d two-Gaussian
mixture (analytic logZ):

1. a standard SMC run with the single-run, lineage-inflated bar;
2. the same budget spent waste-free (``waste_free=True`` pools every
   chain state from n/k ancestors — same accuracy, ~k-fold fewer
   likelihood evaluations) with the windowed Sokal autocorrelation
   diagnostic recorded from the stored chains;
3. ``n_replicates=5`` — five independent replicates whose between-run
   spread covers seed-dependent bias that no single-run estimator can
   see (deliberately under-mixed 10-step MALA chains to show it);
4. an independent cross-check from a different estimator family:
   parallel-tempered MCMC with the adaptive + pilot-refined ladder,
   reporting the stepping-stone logZ and the per-rung swap-acceptance
   diagnostics;
5. ``aspire.replicated_evidence(k)`` — fully independent PIPELINES
   (the flow is re-initialized and refit each cycle), the only bar
   that includes flow-fit seed variation.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from aspire_tpu import Aspire, Samples, configure_logger
from aspire_tpu.models import GaussianMixtureProblem

configure_logger("WARNING")

problem = GaussianMixtureProblem(dims=4)
rng = np.random.default_rng(0)


def comp(mu, var):
    d = len(mu)
    return (
        -0.5 * d * np.log(2 * np.pi * (1 + var))
        - 0.5 * mu @ mu / (1 + var)
    )


true_log_z = float(
    np.logaddexp(comp(problem.mu1, problem.var1),
                 comp(problem.mu2, problem.var2))
    - np.log(2.0)
)

aspire = Aspire(
    log_likelihood=problem.log_likelihood,
    log_prior=problem.log_prior,
    dims=4,
    parameters=problem.parameters,
    flow_backend="nsf",
    seed=3,
)
aspire.fit(
    Samples(problem.draw_initial_samples(rng, 8192)),
    n_epochs=25,
    batch_size=512,
)

print(f"analytic logZ = {true_log_z:.4f}\n")

# 1. Standard SMC: single-run delta-method bar + lineage inflation.
post = aspire.sample_posterior(
    sampler="smc", n_samples=16384, sampler_kwargs={"n_steps": 16},
)
evals = aspire.n_likelihood_evaluations
print(
    f"standard SMC : logZ = {float(post.log_evidence):.4f} "
    f"+- {float(post.log_evidence_error):.4f}  ({evals:.3g} evals)"
)

# 2. Waste-free, windowed-tau diagnostics (automatic: chains stored).
post, history = aspire.sample_posterior(
    sampler="smc",
    n_samples=16384,
    sampler_kwargs={"n_steps": 16, "waste_free": True},
    return_history=True,
)
evals = aspire.n_likelihood_evaluations
print(
    f"waste-free   : logZ = {float(post.log_evidence):.4f} "
    f"+- {float(post.log_evidence_error):.4f}  ({evals:.3g} evals, "
    f"windowed tau per rung: "
    f"{[round(t, 1) for t in history.mcmc_autocorr]})"
)

# 3. Replicated evidence on a deliberately hard configuration:
# 10-step MALA chains mix too slowly for the mixture's mode weights,
# so each run is biased a little differently — the between-run spread
# reports it where any single run's bar cannot.
post = aspire.sample_posterior(
    sampler="mala_smc",
    n_samples=16384,
    sampler_kwargs={"n_steps": 10},
    n_replicates=5,
)
print(
    f"mala@10 x5   : logZ = {float(post.log_evidence):.4f} "
    f"+- {float(post.log_evidence_error):.4f} "
    f"(replicates: "
    f"{[round(float(v), 3) for v in post.log_evidence_replicates]}, "
    f"single-run rms bar {post.log_evidence_error_single:.4f})"
)

# 4. Cross-check from a different estimator family: PT-MCMC with the
# adaptive CESS ladder plus one pilot refinement cycle. Stepping-stone
# telescopes per-rung power ratios, so it stays sharp where the TI
# integrand is steep; the swap-acceptance vector is the ladder-quality
# diagnostic (a low pair = a tempering gap; the pilot tier inserts a
# rung there automatically).
pt = aspire.sample_posterior(
    sampler="ptmcmc",
    n_samples=512,
    n_steps=300,
    n_temperatures=10,
    betas="adaptive",
    swap_every=5,
    ladder_pilot_steps=40,
)
lz_ss, err_ss = pt.log_evidence_stepping_stone()
print(
    f"PT stepping  : logZ = {lz_ss:.4f} +- {err_ss:.4f} "
    f"({len(pt.betas)} rungs, swap acceptance "
    f"{[round(float(v), 2) for v in pt.swap_acceptance]})"
)

# 5. Pipeline replicates: re-init + refit the flow each cycle. The
# sampler-level replicates above share ONE fitted flow, so a flow-fit
# systematic is common-mode and invisible to their spread; this tier
# pays k recompiles to include it.
post = aspire.replicated_evidence(
    3,
    fit_kwargs={"n_epochs": 25, "batch_size": 512},
    sampler="smc",
    n_samples=16384,
    sampler_kwargs={"n_steps": 16},
)
print(
    f"pipeline x3  : logZ = {float(post.log_evidence):.4f} "
    f"+- {float(post.log_evidence_error):.4f} "
    f"(refit replicates: "
    f"{[round(float(v), 3) for v in post.log_evidence_replicates]})"
)
