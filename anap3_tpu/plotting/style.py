"""Shared plot styling (reference style.py:15-29, minus LaTeX).

Importing this module applies the style as a side effect, like the reference.
Math text is rendered with matplotlib's built-in mathtext instead of an
external LaTeX toolchain (not present in this image).
"""

import matplotlib

matplotlib.use("Agg", force=False)

import seaborn as sns  # noqa: E402

sns.set_theme(style="darkgrid", context="paper", font_scale=1.2)

import matplotlib.pyplot as plt  # noqa: E402

plt.rcParams.update({
    "text.usetex": False,
    "mathtext.fontset": "cm",
    "figure.dpi": 110,
    "savefig.bbox": "tight",
})
