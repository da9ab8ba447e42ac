"""Pallas flash-attention kernel (placeholder — jnp path is used until the
kernel lands; see kernels/interface.py for dispatch)."""


def mha_flash(*args, **kwargs):
    raise NotImplementedError("pallas flash attention not yet implemented")
