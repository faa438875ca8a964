"""popcorn_tpu — TPU-native POPCORN framework."""
