"""Gray-level discretization with exact reference semantics.

Replicates the documented behavior of the reference's ``getBinEdges`` /
``binImage`` (/root/reference/radiomics/imageoperations.py:67-174):

* Fixed bin width W: edges equally spaced **from zero** (lowest edge is the
  largest multiple of W that is <= min(X)); top edge extended so the maximum
  falls in its own half-open bin (np.digitize semantics, NOT np.histogram's
  closed last bin); discretized level = floor(x/W) - floor(min/W) + 1.
* Fixed bin count Nb: np.histogram edges with the final edge bumped +1 so the
  maximum joins the top bin under np.digitize.
* Flat region (min == max, min % W == 0): a single [v-0.5, v+0.5) bin
  (imageoperations.py:145-149) so everything maps to level 1.
"""

from __future__ import annotations

import numpy as np


def bin_edges(values: np.ndarray, bin_width: float = 25.0, bin_count: int | None = None) -> np.ndarray:
    """Return half-open bin edges for ``np.digitize``.

    ``values`` is the 1-D ROI intensity array (already filtered to valid
    tokens). Semantics per imageoperations.py:123-151.
    """
    values = np.asarray(values, dtype=np.float64)
    if values.size == 0:
        raise ValueError("cannot bin an empty array")

    if bin_count is not None:
        edges = np.histogram(values, bins=int(bin_count))[1]
        edges = edges.astype(np.float64).copy()
        edges[-1] += 1  # max value joins the topmost half-open bin
        return edges

    lo = float(values.min())
    hi = float(values.max())
    low_bound = lo - (lo % bin_width)
    high_bound = hi + 2 * bin_width
    edges = np.arange(low_bound, high_bound, bin_width)
    if len(edges) == 1:  # flat region exactly on a bin edge
        edges = np.array([edges[0] - 0.5, edges[0] + 0.5])
    return edges


def discretize(values: np.ndarray, bin_width: float = 25.0, bin_count: int | None = None) -> np.ndarray:
    """Discretize intensities to 1-based gray levels (int array).

    Equivalent to ``np.digitize(values, bin_edges(values))`` — with
    fixed-bin-width this equals floor(x/W) - floor(min/W) + 1.
    """
    values = np.asarray(values, dtype=np.float64)
    edges = bin_edges(values, bin_width=bin_width, bin_count=bin_count)
    return np.digitize(values, edges).astype(np.int64)
