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
    norm = EnglishTextNormalizer()  # loads the vendored spelling asset
    assert norm.standardize_spellings is not None
    assert norm("the colour of favour") == "the color of favor"


def test_number_normalizer_documented_cases():
    """The contract documented in the reference docstring
    (normalizers/english.py:13-21) plus ordinals/currency/percent."""
    from svc_inference_pipeline_tpu.models.text_normalizers import (
        EnglishNumberNormalizer,
    )

    num = EnglishNumberNormalizer()
    assert num("twenty one") == "21"
    assert num("one oh one") == "101"
    assert num("double oh seven") == "007"
    assert num("twenty dollars") == "$20"
    assert num("twenty dollars and seven cents") == "$20.07"
    assert num("fifty percent") == "50%"
    assert num("three per cent") == "3%"
    assert num("thirty second") == "32nd"
    assert num("two hundred seventy fourth") == "274th"
    assert num("minus three point five") == "-3.5"
    assert num("one million three hundred thousand") == "1300000"
    assert num("one") == "one"  # kept literal for readability
    assert num("ones and zero") == "ones and 0"
    assert num("seven and a half") == "7.5"
    assert num("the 1960 s were") == "the 1960s were"  # suffix re-joined
    assert num("thirty twos") == "32s"


def test_number_normalizer_matches_reference():
    """Byte-identical output vs the reference EnglishNumberNormalizer /
    EnglishTextNormalizer over a broad case table."""
    import importlib.util
    import sys
    import types

    ref_dir = "/root/reference/utils/whisper_extractor/normalizers"
    import os

    if not os.path.isdir(ref_dir):
        pytest.skip("reference checkout unavailable")
    pkg = types.ModuleType("_refnorm")
    pkg.__path__ = [ref_dir]
    sys.modules["_refnorm"] = pkg
    for name in ("basic", "english"):
        spec = importlib.util.spec_from_file_location(
            f"_refnorm.{name}", os.path.join(ref_dir, f"{name}.py")
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"_refnorm.{name}"] = mod
        spec.loader.exec_module(mod)
    ref_num = sys.modules["_refnorm.english"].EnglishNumberNormalizer()
    ref_full = sys.modules["_refnorm.english"].EnglishTextNormalizer()

    from svc_inference_pipeline_tpu.models.text_normalizers import (
        EnglishNumberNormalizer,
    )

    mine_num = EnglishNumberNormalizer()
    mine_full = EnglishTextNormalizer()

    number_cases = [
        "twenty one dollars", "one hundred and five", "one oh one",
        "nineteen sixty s", "the 1960s were wild", "two hundred five thousand",
        "three point one four one five nine", "minus seven degrees",
        "twenty dollars and seven cents", "$20 million", "twenty million dollars",
        "thirty second street", "two thirds", "double oh seven",
        "triple nine", "fifty percent", "three per cent",
        "a hundred and one dalmatians", "seven and a half hours",
        "two and a half", "one million three hundred thousand",
        "one point five million dollars", "first second third fourth fifth",
        "twelfth night", "four hundredths", "ten thousandths",
        "sixes and sevens", "twenties thirties forties", "one two three four",
        "oh one two", "ninety nine bottles", "plus five", "positive ten",
        "negative three point five", "1,234,567 things", "version 2.5.1 released",
        "he is 6 foot 2", "it cost $1.50", "3rd place", "22nd of may",
        "1st and 2nd", "one thousand and one nights", "zero point zero zero one",
        "a million", "half a million", "one and a half", "nineteen eighty four",
        "two thousand and twenty three", "one dollar", "one cent",
        "ones and zeros", "point five", "and", "double trouble", "triple a",
        "per cent", "percent alone",
    ]
    for case in number_cases:
        assert mine_num(case) == ref_num(case), case

    full_cases = [
        "Mr. Brown paid $1.50 for the 3rd ticket, didn't he?",
        "It's twenty-one degrees colour-wise, favourite colours!",
        "[MUSIC] She said (quietly) um, I'd been there for nineteen sixty s",
        "He'll've... uh, y'all gonna organise the programme?",
        "THREE THOUSAND FIVE HUNDRED AND FORTY-TWO dollars",
        "she's been there, he'd gone, it's got to be 5 per cent",
    ]
    for case in full_cases:
        assert mine_full(case) == ref_full(case).strip(), case


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
