"""SAIS-TPU: a TPU-native surgical-video intelligence framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
danikiyasseh/SAIS (Kiyasseh et al., Nature BME 7:780-796, 2023): surgical
gesture decoding, fine-grained skill assessment, step recognition and
frame-importance attribution from robotic-surgery video.
"""

__version__ = "0.1.0"
