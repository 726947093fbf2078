"""pace_tpu: TPU-native FV3GFS/SHiELD atmospheric model."""
__version__ = "0.1.0"
