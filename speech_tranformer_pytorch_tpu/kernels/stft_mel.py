"""Fused Pallas STFT+mel kernel (placeholder — jnp path in data/features.py
is used until the kernel lands)."""


def log_mel_pallas(*args, **kwargs):
    raise NotImplementedError("pallas stft+mel not yet implemented")
