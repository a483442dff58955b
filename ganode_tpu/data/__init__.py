"""Data layer: rotated-MNIST builder/samplers, UCF101 offline pack + samplers,
clip-consistent keyed transforms, device prefetch."""
from . import transforms
from .frames import FrameFolderVideos, ImageFolderSampler, get_mean, get_std
from .loader import make_global_batch, prefetch
from .rotmnist import (
    RotMNISTImages,
    RotMNISTVideos,
    build_rotmnist,
    load_mnist_idx,
    load_rotmnist,
    load_sklearn_digits,
    rotate_videos,
)
from .video import (
    default_resize_geometry,
    read_avi_pcm_audio,
    read_video_timestamps,
    read_video_with_info,
    resample_frame_indices,
    resize_crop,
)
from .clips import (
    ClipIndex,
    UCF101RandomClipSampler,
    UCF101SequentialClips,
    compute_clips_for_video,
    unfold,
)
from .synthetic import moving_square_video, write_corpus
from .ucf101 import (
    PackedVideoDataset,
    UCF101ClipSampler,
    UCF101ImageSampler,
    pack_arrays,
    pack_ucf101,
    parse_class_index,
    parse_split,
)

__all__ = [
    "ClipIndex",
    "UCF101RandomClipSampler",
    "UCF101SequentialClips",
    "compute_clips_for_video",
    "unfold",
    "FrameFolderVideos",
    "ImageFolderSampler",
    "PackedVideoDataset",
    "get_mean",
    "get_std",
    "RotMNISTImages",
    "RotMNISTVideos",
    "UCF101ClipSampler",
    "UCF101ImageSampler",
    "build_rotmnist",
    "default_resize_geometry",
    "read_avi_pcm_audio",
    "read_video_timestamps",
    "read_video_with_info",
    "resample_frame_indices",
    "resize_crop",
    "load_mnist_idx",
    "load_rotmnist",
    "load_sklearn_digits",
    "make_global_batch",
    "moving_square_video",
    "pack_arrays",
    "pack_ucf101",
    "parse_class_index",
    "parse_split",
    "prefetch",
    "rotate_videos",
    "transforms",
    "write_corpus",
]
