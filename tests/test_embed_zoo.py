"""fastembed model-zoo name resolution (reference config.rs:82-157)."""

from ai00_server_tpu.server.embed import ZOO, resolve_zoo


def test_zoo_covers_reference_enum():
    # All 28 variants of the reference's EmbeddingModel enum resolve.
    assert len(ZOO) == 28
    assert resolve_zoo("BGESmallENV15") == "BAAI/bge-small-en-v1.5"
    assert resolve_zoo("MultilingualE5Small") == \
        "intfloat/multilingual-e5-small"
    # Quantized variants map to the same checkpoint.
    assert resolve_zoo("GTELargeENV15Q") == resolve_zoo("GTELargeENV15")


def test_non_zoo_names_pass_through():
    assert resolve_zoo("assets/models/hf/my-encoder") == \
        "assets/models/hf/my-encoder"
    assert resolve_zoo("org/custom-model") == "org/custom-model"
