"""Generate and EXECUTE the tutorial notebooks from examples/tutorial_*.py.

The reference ships five root-level ``tutorial_*.ipynb`` notebooks; this
repo keeps the single source of truth in runnable ``examples/tutorial_*.py``
scripts (testable, diffable) and derives executed notebooks from them:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/make_notebooks.py

Each notebook = the script's docstring as markdown + an argv cell (quick
budgets for the heavy ones) + the script body as one code cell, executed
with nbclient so the training tables and results are baked into the saved
outputs.  Heavy configs use the scripts' own ``quick`` modes.
"""

import os
import re
import sys

import nbformat
from nbclient import NotebookClient

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# script -> (notebook name, extra argv)
NOTEBOOKS = {
    'tutorial_Pendulum_v1.py': ('tutorial_Pendulum_v1.ipynb', []),
    'tutorial_helloworld_DQN_DDPG_PPO.py':
        ('tutorial_helloworld_DQN_DDPG_PPO.ipynb', []),
    'tutorial_LunarLanderContinuous_v2.py':
        ('tutorial_LunarLanderContinuous_v2.ipynb', ['quick']),
    'tutorial_BipedalWalker_v3.py': ('tutorial_BipedalWalker_v3.ipynb',
                                     ['quick']),
    'tutorial_Creating_VecEnv.py': ('tutorial_Creating_VecEnv.ipynb', []),
}

def script_to_notebook(script_path: str, argv_extra) -> nbformat.NotebookNode:
    src = open(script_path).read()
    m = re.match(r'\s*("""|\'\'\')(.*?)\1\s*', src, re.S)
    doc, body = (m.group(2), src[m.end():]) if m else ('', src)
    # notebooks live at the repo root: import the package from CWD.  The
    # scripts locate the repo via __file__, which notebooks don't have —
    # rewrite ANY sys.path.insert(...) call that mentions __file__
    # (balanced-paren scan tolerates nesting and reflowed lines).
    i = body.find('sys.path.insert')
    while i != -1:
        k = body.index('(', i)
        depth = 0
        while True:
            if body[k] == '(':
                depth += 1
            elif body[k] == ')':
                depth -= 1
                if depth == 0:
                    break
            k += 1
        if '__file__' in body[i:k + 1]:
            body = body[:i] + 'sys.path.insert(0, os.getcwd())' + body[k + 1:]
        i = body.find('sys.path.insert', i + 1)
    if '__file__' in body:
        raise RuntimeError(
            f"{script_path}: __file__ survives the shim rewrite — the "
            f"notebook would fail with NameError inside nbclient")
    name = os.path.basename(script_path)
    nb = nbformat.v4.new_notebook()
    nb.cells = [
        nbformat.v4.new_markdown_cell(
            f"# {name.removesuffix('.py')}\n\n{doc}\n\n"
            f"*Generated from `examples/{name}` by "
            f"`scripts/make_notebooks.py`; the script is the source of "
            f"truth and is exercised by the verification suite.*"),
        nbformat.v4.new_code_cell(
            "import sys\n"
            f"sys.argv = ['{name}'] + {argv_extra!r}"),
        nbformat.v4.new_code_cell(body.strip()),
    ]
    return nb


def main():
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for script, (out_name, argv_extra) in NOTEBOOKS.items():
        if only and only not in script:
            continue
        nb = script_to_notebook(os.path.join(ROOT, 'examples', script),
                                argv_extra)
        print(f"| executing {out_name} ...", flush=True)
        client = NotebookClient(nb, timeout=1800, kernel_name='python3',
                                resources={'metadata': {'path': ROOT}})
        client.execute()
        out_path = os.path.join(ROOT, out_name)
        nbformat.write(nb, out_path)
        print(f"| wrote {out_path}", flush=True)


if __name__ == '__main__':
    main()
