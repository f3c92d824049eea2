"""Tooling smoke tests: viz plots/summaries (the reference's notebook
module, rainier-notebook/.../package.scala) and program inspection (the
reference's rainier-decompile + RealViz)."""

import os
import tempfile

import numpy as np
import pytest

import rainier_tpu as rt
from rainier_tpu import inspection as ins
from rainier_tpu.compute import real as R


@pytest.fixture(scope="module")
def fitted():
    rng = np.random.default_rng(0)
    mu = rt.Normal(0, 5).latent()
    sigma = rt.Exponential(1).latent()
    model = rt.Model.observe(list(rng.normal(1.0, 0.5, 30)),
                             rt.Normal(mu, sigma))
    trace = model.sample(rt.SamplerConfig(200, 200), n_chains=2, seed=0)
    return model, trace, mu, sigma


def test_viz_plots_and_summaries(fitted):
    mpl = pytest.importorskip("matplotlib")
    mpl.use("Agg")
    from rainier_tpu import viz

    model, trace, mu, sigma = fitted
    mus = trace.evaluate(mu)
    sigmas = trace.evaluate(sigma)

    viz.density(mus)
    viz.scatter(mus, sigmas)
    viz.contour(mus, sigmas)
    viz.line(np.arange(10), np.arange(10.0))
    viz.shade(np.arange(10), np.zeros(10), np.ones(10))
    viz.whiskers({"mu": mus, "sigma": sigmas})
    lo, hi = viz.hdpi(mus)
    assert lo < float(np.mean(mus)) < hi
    table = viz.precis({"mu": mus, "sigma": sigmas})
    assert "mu" in table and "sigma" in table
    ct = viz.coeftab({"m1": {"mu": mus}, "m2": {"mu": mus + 1}})
    assert "m1" in ct and "m2" in ct
    with tempfile.TemporaryDirectory() as d:
        path = viz.show("t", os.path.join(d, "p.png"))
        assert os.path.getsize(path) > 0


def test_inspection_dumps(fitted):
    model, trace, mu, sigma = fitted
    jx = ins.jaxpr(model)
    assert "add" in str(jx) or "mul" in str(jx)
    hlo = ins.optimized_hlo(model)
    assert "fusion" in hlo or "HloModule" in hlo
    dot = ins.graphviz(mu + sigma)
    assert dot.strip().startswith("digraph")
    c = ins.cost(model)
    assert c is not None


def test_lines_series_major_ragged_and_short_labels():
    """ADVICE round 1: lines() must accept a (n_series, n_points) array,
    a ragged list of series, a flat single series, and labels shorter
    than the series count."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from rainier_tpu import viz

    xs = np.arange(5.0)
    fig, ax = plt.subplots()
    viz.lines(xs, np.stack([xs, xs * 2]), ax=ax)          # series-major 2D
    viz.lines(xs, [xs.tolist(), (xs * 2)[:3].tolist()],
              ax=ax, labels=["a"])                         # ragged + short
    viz.lines(xs, xs.tolist(), ax=ax)                      # flat = 1 series
    viz.lines(xs, lambda x: [x, x * 2], ax=ax)             # callable
    assert len(ax.lines) == 7
    plt.close(fig)


def test_top_level_reexports():
    """ADVICE round 1: docs/real.md names must exist on rainier_tpu."""
    import rainier_tpu as rt

    for name in ["eq", "lt", "gt", "lte", "gte", "compare", "sum_",
                 "log_sum_exp", "lookup", "two", "neg_one", "to_real",
                 "Column", "IntColumn", "MatColumn"]:
        assert hasattr(rt, name), name
    assert float(rt.neg_one.value) == -1.0


def test_vec_generator_yields_array():
    """ADVICE round 1: Generator.of(Vec) yields a stacked per-row array."""
    import jax

    import rainier_tpu as rt
    from rainier_tpu.core.generator import empty_env, to_generator

    v = rt.Vec.from_([1.0, 2.0, 3.0]).map(lambda x: x * 2)
    g = to_generator(v)
    out = g.get(jax.random.PRNGKey(0), empty_env())
    assert hasattr(out, "shape") and out.shape == (3,)
    assert np.allclose(np.asarray(out), [2.0, 4.0, 6.0])


def test_profiler_trace(tmp_path):
    """inspect.trace produces a loadable profile dir (SURVEY §5 tracing
    equivalent; VERDICT round 1 item 10)."""
    import glob

    import rainier_tpu as rt
    from rainier_tpu import inspect as ins
    from rainier_tpu.sampler import HMC, SamplerConfig

    mu = rt.Normal(0, 1).latent()
    model = rt.Model.observe([0.3, -0.1, 0.5], rt.Normal(mu, 1))
    d = ins.trace(model, SamplerConfig(20, 20, sampler=HMC(3)),
                  log_dir=str(tmp_path / "prof"), n_chains=2)
    files = glob.glob(d + "/**/*", recursive=True)
    assert any("trace" in f or f.endswith(".pb") or f.endswith(".json.gz")
               for f in files), files


def test_website_build(tmp_path):
    """website/build.py renders every doc page with a sidebar and resolves
    intra-doc links (reference: website/ Docusaurus + sidebars.json; the
    executed-snippet half of that pipeline is tests/test_docs.py)."""
    import importlib.util
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "website_build", os.path.join(root, "website", "build.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = str(tmp_path / "site")
    n = mod.build(out)
    docs = [f for f in os.listdir(mod.DOCS) if f.endswith(".md")]
    assert n == len(docs)
    pages = {f for f in os.listdir(out) if f.endswith(".html")}
    assert "index.html" in pages and "intro.html" in pages
    # every internal href resolves to a rendered page
    for page in sorted(pages):
        with open(os.path.join(out, page)) as f:
            text = f.read()
        for href in re.findall(r'href="([\w-]+\.html)', text):
            assert href in pages, (page, href)
        assert "<nav>" in text and "codehilite" in text
