from scp_tpu.codec.slices import LevelSlices, BUCKETS, bucket_for
from scp_tpu.codec.ehem_codec import EHEMCodec
from scp_tpu.codec.octattn_codec import OctAttentionCodec

__all__ = [
    "LevelSlices",
    "BUCKETS",
    "bucket_for",
    "EHEMCodec",
    "OctAttentionCodec",
]
