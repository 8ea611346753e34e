"""Runtime bootstrap: builds the writer/reader pair wired by the op log.

Reference: `build_orama` (lib.rs:190) — LLM service, NLP service,
channel pair, WriteSide, ReadSide; graceful shutdown with final commits
(lib.rs:178-185). A process can host the writer, the reader, or both
(reference cargo features writer/reader; config `role`).
"""

from __future__ import annotations

from typing import Optional, Tuple

from .config import OramacoreConfig
from .embeddings import EmbeddingsService
from .oplog import channel_creator
from .read import ReadSide
from .utils.tokenizer import NLPService
from .write import WriteSide


class Orama:
    def __init__(
        self,
        config: OramacoreConfig,
        write_side: Optional[WriteSide],
        read_side: Optional[ReadSide],
    ):
        self.config = config
        self.write_side = write_side
        self.read_side = read_side

    def stop(self):
        if self.write_side:
            self.write_side.stop()
        if self.read_side:
            self.read_side.stop()


def _init_jax_main_thread():
    """Force JAX backend initialization on the caller's (main) thread.

    Plugin-based backends (the axon TPU tunnel in this environment) fail
    to initialize lazily from executor worker threads; touching devices
    here makes later jnp calls from any thread safe.
    """
    try:
        import jax

        jax.devices()
    except Exception:  # noqa: BLE001 — fall back to CPU
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.devices()


def build_orama(
    config: OramacoreConfig,
    *,
    sync_embeddings: bool = False,
    start_consumer: bool = True,
    llm_resolve_mode=None,
) -> Orama:
    _init_jax_main_thread()
    embeddings = EmbeddingsService(config.ai.embeddings_model)
    nlp = NLPService()

    jwt_manager = None
    if config.auth.jwt_providers:
        from .auth import JwtManager, JwtProvider

        jwt_manager = JwtManager(
            [
                JwtProvider(
                    issuer=p.issuer, audience=p.audience,
                    hs256_secret=p.hs256_secret, jwks_url=p.jwks_url,
                )
                for p in config.auth.jwt_providers
            ]
        )

    role = config.role
    write_side = None
    read_side = None

    if role in ("both", "writer"):
        sender, receiver_factory = channel_creator(config.writer_side.output)
        write_side = WriteSide(
            config, sender, embeddings, nlp, sync_embeddings=sync_embeddings
        )
        if role == "both":
            read_side = ReadSide(
                config, receiver_factory, embeddings, nlp,
                llm_resolve_mode=llm_resolve_mode,
            )
    if role == "reader":
        _, receiver_factory = channel_creator(config.reader_side.input)
        read_side = ReadSide(
            config, receiver_factory, embeddings, nlp,
            llm_resolve_mode=llm_resolve_mode,
        )

    if write_side is not None:
        write_side.jwt_manager = jwt_manager
    if read_side is not None:
        read_side.jwt_manager = jwt_manager
    if read_side is not None and start_consumer:
        read_side.start()
    return Orama(config, write_side, read_side)
