"""Lightweight QC report generator (HTML + PNG mosaics).

Parity target: SCT ``sct_qc`` HTML reports invoked per subject
(`pipeline_bids_register_evaluate.sh:159-164`, `README.md:114`): a browsable
page showing, per subject, the fixed volume with the moving/moved volumes,
segmentation overlays, and the warped deformation grid (sct_qc's
registration view) for visual QC.

Thread-safety: ``add_subject`` may be called from ``--jobs N`` worker threads
(`pipeline/batch.py`); it only does numpy work (load + mosaic) and appends
under a lock. All matplotlib rendering happens in :meth:`write` on the
calling thread — matplotlib is not thread-safe even with Agg.
"""

from __future__ import annotations

import base64
import html
import io
import os
import threading

import numpy as np

from multimodal_registration_tpu.utils import nifti


def _mosaic(vol: np.ndarray, n_slices: int = 6, axis: int = 2) -> np.ndarray:
    idx = np.linspace(0, vol.shape[axis] - 1, n_slices + 2, dtype=int)[1:-1]
    slices = [np.take(vol, i, axis=axis).T[::-1] for i in idx]
    return np.concatenate(slices, axis=1)


def _png_b64(img: np.ndarray, overlay: np.ndarray | None = None,
             overlay_cmap: str = "autumn") -> str:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(img.shape[1] / 50, img.shape[0] / 50), dpi=100)
    ax.imshow(img, cmap="gray", interpolation="nearest")
    if overlay is not None:
        masked = np.ma.masked_where(overlay == 0, overlay)
        ax.imshow(masked, cmap=overlay_cmap, alpha=0.5, interpolation="nearest")
    ax.axis("off")
    buf = io.BytesIO()
    fig.savefig(buf, format="png", bbox_inches="tight", pad_inches=0)
    plt.close(fig)
    return base64.b64encode(buf.getvalue()).decode()


def make_grid_volume(shape, spacing: int = 8) -> np.ndarray:
    """In-plane gridline volume: x/y lattice planes (axial slices show a 2-D
    grid; warping it visualizes the deformation like sct_qc's grid view)."""
    g = np.zeros(shape, np.float32)
    g[::spacing, :, :] = 1.0
    g[:, ::spacing, :] = 1.0
    return g


def warped_grid_mosaic(warp_data: np.ndarray, scale: int, shape,
                       n_slices: int = 6, spacing: int = 8) -> np.ndarray:
    """Mosaic of the warped gridline volume, computed analytically on host.

    Replaces the round-3 device path (make_grid_volume → full-res device warp
    → mosaic): on the tunnel-attached TPU that costs a ~40 MB round trip for
    a QC panel. The gridline volume is z-invariant and separable, so its
    linear interpolation at warped coordinates has the closed form
    ``A + B - A*B`` with A/B the tent distance to the nearest lattice plane —
    evaluated only at the displayed slices (PERF.md round 4).
    """
    from scipy.ndimage import map_coordinates

    X, Y, Z = [int(s) for s in shape[:3]]
    idx = np.linspace(0, Z - 1, n_slices + 2, dtype=int)[1:-1]
    GX, GY = np.meshgrid(np.arange(X, dtype=np.float64),
                         np.arange(Y, dtype=np.float64), indexing="ij")

    def tent(p, n):
        # nearest lattice plane, restricted to planes that exist in [0, n)
        near = spacing * np.round(p / spacing)
        near = np.clip(near, 0, ((n - 1) // spacing) * spacing)
        return np.clip(1.0 - np.abs(p - near), 0.0, 1.0)

    panels = []
    w = np.asarray(warp_data, np.float32)
    for k in idx:
        # int-res field sampled at the full-res slice (corner-aligned: q/scale)
        coords = np.stack([GX / scale, GY / scale,
                           np.full_like(GX, k / scale)], 0)
        phix = map_coordinates(w[..., 0], coords, order=1, mode="nearest") * scale
        phiy = map_coordinates(w[..., 1], coords, order=1, mode="nearest") * scale
        px = np.clip(GX + phix, 0, X - 1)  # edge-clamped like the device warp
        py = np.clip(GY + phiy, 0, Y - 1)
        A, B = tent(px, X), tent(py, Y)
        g = A + B - A * B
        panels.append(g.T[::-1])
    return np.concatenate(panels, axis=1).astype(np.float32)


class QCReport:
    def __init__(self, qc_dir: str, title: str = "Registration QC"):
        self.qc_dir = qc_dir
        self.title = title
        self.entries = []
        self._lock = threading.Lock()
        os.makedirs(qc_dir, exist_ok=True)

    def add_subject(
        self,
        subject: str,
        fixed_path: str,
        moving_path: str,
        moved_path: str,
        seg_paths: dict | None = None,
        metrics: dict | None = None,
        warped_grid: np.ndarray | None = None,
        grid_mosaic: np.ndarray | None = None,
    ):
        """Collect mosaics for one subject (numpy only — thread-safe).

        ``grid_mosaic``: precomputed warped-gridline mosaic (the cheap
        :func:`warped_grid_mosaic` path). ``warped_grid``: a full warped
        gridline VOLUME (legacy path, mosaicked here).
        """
        panels = []  # (name, img_mosaic, overlay_mosaic | None, overlay_cmap)
        segs = seg_paths or {}
        moved_mosaic = None
        for name, path in [("fixed", fixed_path), ("moving", moving_path), ("moved", moved_path)]:
            vol = nifti.load(path, cached=True).get_fdata(np.float32)
            # display normalization from a stride-2 subsample — percentile
            # sorts 4.9M f64 voxels otherwise, for a QC brightness window
            lo, hi = np.percentile(vol[::2, ::2, ::2], [1, 99])
            vol = np.clip((vol - lo) / max(hi - lo, 1e-9), 0, 1)
            m = _mosaic(vol)
            if name == "moved":
                moved_mosaic = m
            overlay = None
            if name in segs and os.path.exists(segs[name]):
                overlay = _mosaic(nifti.load(segs[name], cached=True).get_fdata())
            panels.append((name, m, overlay, "autumn"))
        if grid_mosaic is None and warped_grid is not None:
            grid_mosaic = _mosaic(np.asarray(warped_grid, np.float32))
        if grid_mosaic is not None and moved_mosaic is not None:
            grid_m = (np.asarray(grid_mosaic) > 0.3).astype(np.float32)
            panels.append(("moved + deformation grid", moved_mosaic, grid_m, "cool"))
        with self._lock:
            self.entries.append(
                {"subject": subject, "panels": panels, "metrics": metrics or {}}
            )

    def write(self) -> str:
        rows = []
        with self._lock:
            entries = sorted(self.entries, key=lambda e: e["subject"])
        for e in entries:
            imgs = "".join(
                f"<figure><figcaption>{html.escape(n)}</figcaption>"
                f'<img src="data:image/png;base64,{_png_b64(m, ov, cm)}"/></figure>'
                for n, m, ov, cm in e["panels"]
            )
            mets = "".join(
                f"<li>{html.escape(str(k))}: {html.escape(f'{v:.4f}' if isinstance(v, float) else str(v))}</li>"
                for k, v in e["metrics"].items()
            )
            rows.append(
                f"<section><h2>{html.escape(e['subject'])}</h2>{imgs}<ul>{mets}</ul></section>"
            )
        doc = (
            "<!doctype html><html><head><meta charset='utf-8'>"
            f"<title>{html.escape(self.title)}</title>"
            "<style>body{font-family:sans-serif;background:#111;color:#eee}"
            "img{max-width:100%;display:block}figure{margin:4px 0}"
            "section{border-bottom:1px solid #444;padding:8px 0}</style>"
            f"</head><body><h1>{html.escape(self.title)}</h1>{''.join(rows)}</body></html>"
        )
        out = os.path.join(self.qc_dir, "index.html")
        with open(out, "w") as f:
            f.write(doc)
        return out
