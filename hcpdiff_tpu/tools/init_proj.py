"""Project initializer (``hcpinit``, reference tools/init_proj.py +
setup.py:47-50): copy the shipped cfgs + prompt templates into CWD."""
from __future__ import annotations

import os
import shutil


def main():
    pkg_root = os.path.abspath(os.path.join(os.path.dirname(__file__), '..', '..'))
    for d in ('cfgs', 'prompt_tuning_template'):
        src = os.path.join(pkg_root, d)
        if os.path.isdir(src):
            shutil.copytree(src, os.path.join(os.getcwd(), d),
                            dirs_exist_ok=True)
            print(f'copied {d}/')
    os.makedirs('embs', exist_ok=True)
    os.makedirs('exps', exist_ok=True)
    print('project initialized')


if __name__ == '__main__':
    main()
