"""Host-side visualization exports.

Replaces the reference's interactive viewers — the Klampt OpenGL roadmap
GUI (``visualization/klampt_vis.py``), matplotlib workspace plots
(``grr/workspace.py:460-593``), and the Open3D window (``stitcher.py``) —
with display-less-friendly artifacts: PNG plots, PLY exports, and
self-contained interactive HTML viewers (``html_export``) that open in
any browser with orbit/zoom/pan.
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
from reconplan_tpu.viz.html_export import (  # noqa: E402
    export_cloud_html,
    export_mesh_html,
    export_roadmap_html,
)
