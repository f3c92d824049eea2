#!/usr/bin/env python
"""Static documentation site generator — the TPU build's analogue of the
reference's Docusaurus website (/root/reference/website/siteConfig.js,
sidebars.json) fed by mdoc-compiled docs.  Our split of that pipeline:
`tests/test_docs.py` executes the doc snippets (the mdoc half) and this
script renders `docs/*.md` into a self-contained HTML site with a
sidebar (the Docusaurus half).  Pure stdlib + python-markdown/pygments
(both baked into the image); no node, no network.

Usage: python website/build.py [--out website/site]
"""

import argparse
import html
import os
import re
import shutil

import markdown
from pygments.formatters import HtmlFormatter

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = os.path.join(ROOT, "docs")

# Sidebar mirrors the reference's website/sidebars.json groups, extended
# with the sections this framework adds.
SIDEBAR = [
    ("Overview", ["intro", "probprog", "priors", "likelihoods",
                  "vectors", "posteriors"]),
    ("Installation", ["install", "jupyter", "roadmap", "modules"]),
    ("API Reference", ["distributions", "model", "generator", "real",
                       "vec", "samplers"]),
    ("Scaling & Performance", ["parallel", "performance", "internals"]),
    ("Beyond the reference", ["smc", "variational", "marginalization",
                              "reparameterization"]),
]

PAGE = """<!doctype html>
<html lang="en"><head><meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} · rainier-tpu</title>
<style>
:root {{ --fg:#1a1a1a; --bg:#ffffff; --accent:#2f6f4f; --dim:#6b6b6b; }}
* {{ box-sizing:border-box; }}
body {{ margin:0; font:16px/1.6 system-ui,-apple-system,Segoe UI,sans-serif;
       color:var(--fg); background:var(--bg); }}
.wrap {{ display:flex; max-width:1100px; margin:0 auto; }}
nav {{ width:230px; flex:none; padding:24px 16px; border-right:1px solid #e4e4e4;
      font-size:14px; min-height:100vh; }}
nav h1 {{ font-size:16px; margin:0 0 12px; }}
nav h2 {{ font-size:11px; text-transform:uppercase; letter-spacing:.08em;
         color:var(--dim); margin:18px 0 4px; }}
nav a {{ display:block; color:var(--fg); text-decoration:none; padding:2px 6px;
        border-radius:4px; }}
nav a:hover {{ background:#f0f0f0; }}
nav a.active {{ color:var(--accent); font-weight:600; }}
main {{ flex:1; padding:24px 32px 64px; min-width:0; }}
main h1,main h2,main h3 {{ line-height:1.25; }}
main a {{ color:var(--accent); }}
pre {{ background:#f6f8f6; border:1px solid #e4e8e4; border-radius:6px;
      padding:12px 14px; overflow-x:auto; font-size:13.5px; }}
code {{ font-family:ui-monospace,SFMono-Regular,Menlo,monospace; font-size:.92em; }}
:not(pre)>code {{ background:#f2f2f2; border-radius:3px; padding:1px 4px; }}
table {{ border-collapse:collapse; }}
th,td {{ border:1px solid #ddd; padding:4px 10px; text-align:left; }}
{pygments}
</style></head><body><div class="wrap">
<nav><h1><a href="intro.html">rainier-tpu</a></h1>{nav}</nav>
<main>{body}</main>
</div></body></html>
"""


def _title(md_text, fallback):
    m = re.search(r"^#\s+(.+)$", md_text, re.M)
    return m.group(1).strip() if m else fallback


def _nav_html(active):
    out = []
    for section, pages in SIDEBAR:
        out.append(f"<h2>{html.escape(section)}</h2>")
        for p in pages:
            cls = ' class="active"' if p == active else ""
            out.append(f'<a href="{p}.html"{cls}>{p}</a>')
    return "\n".join(out)


def build(out_dir):
    os.makedirs(out_dir, exist_ok=True)
    md = markdown.Markdown(extensions=["fenced_code", "codehilite",
                                       "tables", "toc"],
                           extension_configs={
                               "codehilite": {"guess_lang": False}})
    pyg = HtmlFormatter(style="default").get_style_defs(".codehilite")
    pages = sorted(f for f in os.listdir(DOCS) if f.endswith(".md"))
    listed = {p for _, ps in SIDEBAR for p in ps}
    names = {os.path.splitext(f)[0] for f in pages}
    # every doc page must be reachable from the sidebar
    orphans = names - listed
    if orphans:
        raise SystemExit(f"docs not in SIDEBAR: {sorted(orphans)}")
    missing = listed - names
    if missing:
        raise SystemExit(f"SIDEBAR entries without docs: {sorted(missing)}")

    for fname in pages:
        name = os.path.splitext(fname)[0]
        with open(os.path.join(DOCS, fname)) as f:
            text = f.read()
        # intra-docs links: foo.md -> foo.html
        text = re.sub(r"\(([\w-]+)\.md(#[\w-]*)?\)", r"(\1.html\2)", text)
        md.reset()
        body = md.convert(text)
        page = PAGE.format(title=html.escape(_title(text, name)),
                           nav=_nav_html(name), body=body, pygments=pyg)
        with open(os.path.join(out_dir, name + ".html"), "w") as f:
            f.write(page)
    shutil.copyfile(os.path.join(out_dir, "intro.html"),
                    os.path.join(out_dir, "index.html"))
    return len(pages)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "site"))
    args = ap.parse_args()
    n = build(args.out)
    print(f"rendered {n} pages -> {args.out}")
