import pytest

from svc_inference_pipeline_tpu.models.text_normalizers import (
    BasicTextNormalizer,
    EnglishTextNormalizer,
)


def test_basic_normalizer():
    norm = BasicTextNormalizer()
    assert norm("Hello, World!") == "hello world"
    assert norm("[noise] spoken (laughs) text") == "spoken text"
    assert norm("  a   b\tc ") == "a b c"


def test_basic_normalizer_diacritics():
    norm = BasicTextNormalizer(remove_diacritics=True)
    assert norm("café naïve") == "cafe naive"


def test_english_normalizer_contractions():
    norm = EnglishTextNormalizer(spelling_file=None)
    assert norm("I'm sure it won't rain, y'all") == "i am sure it will not rain you all"
    assert norm("they're can't don't") == "they are can not do not"
    assert norm("Mr. Smith") == "mister smith"


def test_english_normalizer_numbers_and_punct():
    norm = EnglishTextNormalizer(spelling_file=None)
    assert norm("1,000 items.") == "1000 items"
    assert norm("it costs $3.50!") == "it costs $3.50"


def test_english_normalizer_spelling_table():
    norm = EnglishTextNormalizer()  # loads reference english.json if present
    if norm.spelling:
        assert norm("the colour of favour") == "the color of favor"
    else:
        pytest.skip("reference spelling table unavailable")


def test_whisper_beam_decode_smoke(cfg):
    """Beam search runs on a tiny random model and ranks hypotheses."""
    import jax
    import jax.numpy as jnp

    from svc_inference_pipeline_tpu.models.whisper import (
        WhisperAudioEncoder,
        WhisperDims,
        WhisperTextDecoder,
    )
    from svc_inference_pipeline_tpu.models.whisper_decoding import (
        DecodingOptions,
        WhisperDecoder,
        get_tokenizer,
    )
    from svc_inference_pipeline_tpu.utils.devices import fast_random_params

    try:
        tokenizer = get_tokenizer(multilingual=True)
    except FileNotFoundError:
        pytest.skip("tokenizer assets unavailable")

    dims = WhisperDims(80, 1500, 64, 4, 1, len(tokenizer.tokenizer) + 110, 448, 64, 4, 1)
    enc_params = fast_random_params(
        lambda: WhisperAudioEncoder(dims).init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 3000)))
    )["params"]
    dec_params = fast_random_params(
        lambda: WhisperTextDecoder(dims).init(
            jax.random.PRNGKey(1), jnp.zeros((1, 3), jnp.int32),
            jnp.zeros((1, dims.n_audio_ctx, dims.n_audio_state)),
        )
    )["params"]
    dec = WhisperDecoder(dims, enc_params, dec_params)
    feats = dec.embed_audio(jnp.zeros((1, 80, 3000)))
    result = dec.beam_decode(
        feats, tokenizer, DecodingOptions(sample_len=4, language="en"), beam_size=2
    )
    assert isinstance(result.text, str)
