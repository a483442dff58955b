"""Evaluation: Inception Score, Frechet video distance, feature extractors."""
from .embedder import ImageClassifier, VideoEmbedder, embed_videos, train_classifier
from .metrics import (
    feature_stats,
    frechet_distance,
    fvd,
    inception_score,
    score_generator,
)

__all__ = [
    "ImageClassifier",
    "VideoEmbedder",
    "embed_videos",
    "feature_stats",
    "frechet_distance",
    "fvd",
    "inception_score",
    "score_generator",
    "train_classifier",
]
