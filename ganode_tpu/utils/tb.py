"""TensorBoard event-file writer, dependency-free.

The reference's stage-2 CIFAR notebook logs losses through
``torch.utils.tensorboard.SummaryWriter`` (reference
stage2/test_ODE_training_with_cifar_GAN.ipynb cell 1: ``SummaryWriter()`` +
``add_scalar`` per step). This module reproduces that observability surface
without importing torch or tensorflow into the training process: it writes the
TFRecord-framed ``Event`` protos by hand (varint/field encoding + masked
CRC-32C framing), which is all ``tensorboard --logdir`` needs to plot scalars.

Wire level (both stable, version-frozen formats):
  * TFRecord frame:  u64 length | masked crc32c(length) | payload | masked
    crc32c(payload), crc mask = rotl-15 + 0xa282ead8.
  * Event proto:     1: wall_time (double), 2: step (int64),
                     3: file_version (string, first record only),
                     5: summary { repeated 1: value { 1: tag (string),
                     2: simple_value (float) } }.

Validated in tests by reading the files back with the *installed* tensorboard's
own EventFileLoader (tests/test_infra.py), so the encoding is checked against
the real consumer, not against itself.
"""
from __future__ import annotations

import os
import socket
import struct
import time
from typing import Dict, Iterable, Tuple, Union

# --------------------------------------------------------------------- crc32c
# Castagnoli polynomial (reflected): the TFRecord framing checksum.
_CRC_TABLE = []
for _n in range(256):
    _c = _n
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def _crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ------------------------------------------------------------ proto encoding
def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _field_bytes(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _field_double(field: int, value: float) -> bytes:
    return _tag(field, 1) + struct.pack("<d", value)


def _field_float(field: int, value: float) -> bytes:
    return _tag(field, 5) + struct.pack("<f", value)


def _field_varint(field: int, value: int) -> bytes:
    return _tag(field, 0) + _varint(value & 0xFFFFFFFFFFFFFFFF)


def _scalar_event(wall_time: float, step: int,
                  scalars: Iterable[Tuple[str, float]]) -> bytes:
    values = b"".join(
        _field_bytes(1, _field_bytes(1, tag.encode("utf-8"))
                     + _field_float(2, float(value)))
        for tag, value in scalars)
    return (_field_double(1, wall_time) + _field_varint(2, int(step))
            + _field_bytes(5, values))


def _version_event(wall_time: float) -> bytes:
    return _field_double(1, wall_time) + _field_bytes(3, b"brain.Event:2")


# ---------------------------------------------------------------- the writer
class EventWriter:
    """Append-only scalar event writer: ``add_scalar(s)`` / ``flush`` / ``close``.

    One instance owns one ``events.out.tfevents.*`` file under ``logdir``
    (created if needed). All writes are synchronous file appends — the volumes
    here (a few floats every logged step) don't justify a writer thread.
    """

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        name = "events.out.tfevents.%d.%s" % (int(time.time()),
                                              socket.gethostname())
        self.path = os.path.join(logdir, name)
        self._f = open(self.path, "ab")
        self._record(_version_event(time.time()))

    def _record(self, payload: bytes) -> None:
        header = struct.pack("<Q", len(payload))
        self._f.write(header)
        self._f.write(struct.pack("<I", _masked_crc(header)))
        self._f.write(payload)
        self._f.write(struct.pack("<I", _masked_crc(payload)))

    def add_scalar(self, tag: str, value: Union[float, int], step: int,
                   wall_time: float | None = None) -> None:
        self.add_scalars({tag: value}, step, wall_time=wall_time)

    def add_scalars(self, scalars: Dict[str, Union[float, int]], step: int,
                    wall_time: float | None = None) -> None:
        """One Event carrying every (tag, value) pair at this step."""
        self._record(_scalar_event(wall_time or time.time(), step,
                                   scalars.items()))

    def flush(self) -> None:
        self._f.flush()

    def close(self) -> None:
        if not self._f.closed:
            self._f.flush()
            self._f.close()
