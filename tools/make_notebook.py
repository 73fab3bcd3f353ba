"""Render a ``# %%`` cell script into an executed .ipynb.

The reference ships its tutorial as a rendered notebook with outputs
(``/root/reference/tutorial/tutorial.ipynb``); this repo's tutorial lives as
a percent-format script (``tutorial/tutorial.py``). This tool converts the
script to notebook cells (``# %% [markdown]`` blocks become markdown cells,
``# %%`` blocks become code cells) and executes it top-to-bottom with
nbclient so the committed .ipynb carries real outputs.

Usage::

    python -m tools.make_notebook tutorial/tutorial.py tutorial/tutorial.ipynb
"""

from __future__ import annotations

import argparse
import re
import sys

_CELL_RE = re.compile(r"^# %%(?: \[(\w+)\])?\s*$")


def parse_percent_script(text: str) -> list[tuple[str, str]]:
    """Split percent-format source into (kind, source) cells."""
    cells: list[tuple[str, list[str]]] = []
    kind = None
    for line in text.splitlines():
        m = _CELL_RE.match(line)
        if m:
            kind = m.group(1) or "code"
            cells.append((kind, []))
            continue
        if not cells:  # preamble before the first marker -> code cell
            cells.append(("code", []))
        cells[-1][1].append(line)

    out = []
    for kind, lines in cells:
        if kind == "markdown":
            # strip the comment prefix jupytext-style
            lines = [re.sub(r"^# ?", "", ln) for ln in lines]
        src = "\n".join(lines).strip("\n")
        if src:
            out.append((kind, src))
    return out


def build_notebook(cells: list[tuple[str, str]]):
    import nbformat

    nb = nbformat.v4.new_notebook()
    nb.metadata["kernelspec"] = {
        "display_name": "Python 3", "language": "python", "name": "python3",
    }
    nb.metadata["language_info"] = {"name": "python", "version": sys.version.split()[0]}
    for kind, src in cells:
        if kind == "markdown":
            nb.cells.append(nbformat.v4.new_markdown_cell(src))
        else:
            nb.cells.append(nbformat.v4.new_code_cell(src))
    return nb


def execute(nb, cwd: str, timeout: int = 1200):
    from nbclient import NotebookClient

    NotebookClient(nb, timeout=timeout, resources={"metadata": {"path": cwd}}).execute()
    return nb


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--no-execute", action="store_true")
    p.add_argument("--cwd", default=".", help="working dir for execution")
    args = p.parse_args(argv)

    import nbformat

    with open(args.src) as f:
        nb = build_notebook(parse_percent_script(f.read()))
    if not args.no_execute:
        execute(nb, args.cwd)
    with open(args.dst, "w") as f:
        nbformat.write(nb, f)
    n_out = sum(len(c.get("outputs", [])) for c in nb.cells)
    print(f"wrote {args.dst}: {len(nb.cells)} cells, {n_out} outputs")


if __name__ == "__main__":
    main(sys.argv[1:])
