"""Test alias for the packaged dense reference implementation."""

from cuda_bundle_adjustment_tpu.utils.dense_reference import *  # noqa: F401,F403
from cuda_bundle_adjustment_tpu.utils.dense_reference import DenseLM  # noqa: F401
