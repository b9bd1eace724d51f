"""gctplus_tpu — a TPU-native Transformer-CVAE framework for molecular generation.

A from-scratch JAX/Flax/Pallas re-design of the capabilities of GCT-Plus
(reference: chaoting-sun/GCT-Plus): four conditional-VAE variants
(vaetf / pvaetf / scavaetf / pscavaetf) over a Transformer encoder-decoder,
KV-cached autoregressive SMILES decoding, KL-annealed ELBO training with
data-parallel sharding over a TPU mesh, and an in-repo chemistry substrate
(SMILES parsing, canonicalization, Murcko scaffolds, fingerprints,
descriptors) replacing the reference's RDKit dependency.
"""

__version__ = "0.1.0"
