"""Host-side visualization exports (headless).

Replaces the reference's interactive viewers — the Klampt OpenGL roadmap
GUI (``visualization/klampt_vis.py``), matplotlib workspace plots
(``grr/workspace.py:460-593``), and the Open3D window (``stitcher.py``) —
with headless artifact generation: PNG plots and PLY exports that work on a
display-less TPU host.
"""

from reconplan_tpu.viz.plots import (
    plot_workspace_graph,
    plot_roadmap_disconnections,
    plot_trajectory_tracking,
)

__all__ = [
    "plot_workspace_graph",
    "plot_roadmap_disconnections",
    "plot_trajectory_tracking",
]
