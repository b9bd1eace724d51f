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

# Persistent XLA compilation cache: first-compile latency dominates
# short jobs (and is severe through remote-compile tunnels); cached
# binaries make restarts/resumes near-instant. CPU AOT artifacts are
# machine-feature-sensitive (can SIGILL across hosts), so the cache is
# only enabled when a non-CPU platform is configured. Opt out with
# GCTPLUS_NO_COMPILE_CACHE=1.
import os as _os

if not _os.environ.get("GCTPLUS_NO_COMPILE_CACHE"):
    try:
        import jax as _jax

        # the config API wins over the env var: a site hook pins
        # JAX_PLATFORMS before user code, and CPU-forcing callers
        # (tests, dryrun_multichip) can only override via the config
        _platforms = (getattr(_jax.config, "jax_platforms", None)
                      or _os.environ.get("JAX_PLATFORMS") or "").lower()
        if _platforms not in ("cpu", "", None):
            # default cache lives inside the repo (gitignored): /tmp is
            # wiped between sessions on this machine, and TPU-program
            # binaries keyed to the same chip stay valid across them
            _default_cache = _os.path.join(
                _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                "_cache", "jax")
            _jax.config.update("jax_compilation_cache_dir",
                               _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                               _default_cache))
            _jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
