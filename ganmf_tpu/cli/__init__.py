"""Experiment-harness CLIs (reference RecSysExp.py / RunBestParameters.py /
AblationStudy.py equivalents).

Each module exposes ``main(argv)``; the zero-argument wrappers below are the
``[project.scripts]`` console entry points (pyproject.toml), so an installed
copy gets ``ganmf-exp`` / ``ganmf-run-best`` / ``ganmf-ablation`` /
``ganmf-describe`` binaries while ``python -m ganmf_tpu.cli.experiment ...``
keeps working from a checkout.
"""

import sys


def experiment_main() -> None:
    from ganmf_tpu.cli.experiment import main

    main(sys.argv[1:])


def run_best_main() -> None:
    from ganmf_tpu.cli.run_best import main

    main(sys.argv[1:])


def ablation_main() -> None:
    from ganmf_tpu.cli.ablation import main

    main(sys.argv[1:])


def describe_main() -> None:
    from ganmf_tpu.cli.describe import main

    main(sys.argv[1:])
