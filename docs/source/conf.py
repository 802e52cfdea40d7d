"""Sphinx configuration for the anap3_tpu documentation."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

project = "cavity-tpu (anap3_tpu)"
author = "anap3_tpu developers"
release = "0.1.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.mathjax",
]

autodoc_mock_imports = ["jax", "jaxlib", "pandas", "matplotlib", "seaborn",
                        "scipy", "h5py"]
html_theme = "alabaster"
exclude_patterns = []
