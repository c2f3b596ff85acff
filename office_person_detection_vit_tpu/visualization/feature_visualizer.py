"""Re-ID feature-space diagnostics (reference
src/visualization/feature_visualizer.py:42-254).

t-SNE projection, KMeans clustering, silhouette quality of appearance
features — offline host-side analysis (sklearn) for judging whether Re-ID
features separate identities.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

logger = logging.getLogger(__name__)


class FeatureVisualizer:
    def __init__(self, random_state: int = 0):
        self.random_state = random_state

    def project_tsne(
        self, features: np.ndarray, perplexity: float | None = None
    ) -> np.ndarray:
        """(N, D) -> (N, 2) t-SNE embedding (reference :42)."""
        from sklearn.manifold import TSNE

        n = len(features)
        if perplexity is None:
            perplexity = max(2.0, min(30.0, (n - 1) / 3))
        return TSNE(
            n_components=2,
            perplexity=perplexity,
            random_state=self.random_state,
            init="pca",
        ).fit_transform(np.asarray(features, np.float64))

    def cluster(
        self, features: np.ndarray, n_clusters: int
    ) -> tuple[np.ndarray, float]:
        """KMeans labels + silhouette score (reference :120-200)."""
        from sklearn.cluster import KMeans
        from sklearn.metrics import silhouette_score

        labels = KMeans(
            n_clusters=n_clusters, random_state=self.random_state, n_init=10
        ).fit_predict(features)
        score = (
            float(silhouette_score(features, labels))
            if 1 < n_clusters < len(features)
            else 0.0
        )
        return labels, score

    def quality_report(
        self, features: np.ndarray, track_ids: np.ndarray
    ) -> dict[str, Any]:
        """How well do features separate the true track identities?"""
        from sklearn.metrics import silhouette_score

        ids = np.asarray(track_ids)
        unique = np.unique(ids)
        report: dict[str, Any] = {
            "num_features": int(len(features)),
            "num_tracks": int(len(unique)),
        }
        if 1 < len(unique) < len(features):
            report["silhouette_by_track"] = float(silhouette_score(features, ids))
            _, kmeans_sil = self.cluster(features, len(unique))
            report["silhouette_by_kmeans"] = kmeans_sil
        return report

    def plot_embedding(
        self,
        features: np.ndarray,
        track_ids: np.ndarray,
        output_path: str | Path,
    ) -> Path:
        """t-SNE scatter colored by track id (reference :200-254)."""
        emb = self.project_tsne(features)
        ids = np.asarray(track_ids)
        fig, ax = plt.subplots(figsize=(8, 8))
        for tid in np.unique(ids):
            pts = emb[ids == tid]
            ax.scatter(pts[:, 0], pts[:, 1], s=18, label=f"id {tid}", alpha=0.8)
        ax.set_title("Re-ID feature embedding (t-SNE)")
        if len(np.unique(ids)) <= 20:
            ax.legend(fontsize=7, loc="best")
        out = Path(output_path)
        out.parent.mkdir(parents=True, exist_ok=True)
        fig.tight_layout()
        fig.savefig(out, dpi=120)
        plt.close(fig)
        return out
