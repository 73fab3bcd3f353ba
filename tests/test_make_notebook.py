"""tools/make_notebook.py: percent-script → notebook conversion, and the
committed tutorial.ipynb artifact itself (the reference ships a rendered
notebook, /root/reference/tutorial/tutorial.ipynb)."""

import os

import pytest

from tools.make_notebook import build_notebook, parse_percent_script

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_parse_percent_cells():
    src = """# %% [markdown]
# # Title
# body text

# %%
x = 1
print(x)

# %% [markdown]
# tail

# %%
y = x + 1
"""
    cells = parse_percent_script(src)
    assert [k for k, _ in cells] == ["markdown", "code", "markdown", "code"]
    assert cells[0][1] == "# Title\nbody text"
    assert cells[1][1] == "x = 1\nprint(x)"


def test_build_notebook_structure():
    nb = build_notebook([("markdown", "# T"), ("code", "1 + 1")])
    assert nb.cells[0].cell_type == "markdown"
    assert nb.cells[1].cell_type == "code"
    assert nb.cells[1].source == "1 + 1"


def test_committed_tutorial_notebook_has_outputs():
    import nbformat

    path = os.path.join(_ROOT, "tutorial", "tutorial.ipynb")
    if not os.path.exists(path):
        pytest.fail("tutorial/tutorial.ipynb missing — regenerate with "
                    "`python -m tools.make_notebook tutorial/tutorial.py "
                    "tutorial/tutorial.ipynb`")
    nb = nbformat.read(path, as_version=4)
    nbformat.validate(nb)
    code_cells = [c for c in nb.cells if c.cell_type == "code"]
    assert len(code_cells) >= 5
    executed = [c for c in code_cells if c.get("outputs")]
    assert len(executed) >= 5, "tutorial notebook must carry executed outputs"
    # the source cells stay in sync with tutorial.py
    script_cells = parse_percent_script(
        open(os.path.join(_ROOT, "tutorial", "tutorial.py")).read())
    assert len([k for k, _ in script_cells if k == "code"]) == len(code_cells)
