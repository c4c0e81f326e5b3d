"""BrazilianStemmer vs reference vectors (TestBrazilianStemmer.cs)."""

import pytest

from lucenenet_ray.analysis.brazilian import brazilian_stem


def st(w):
    r = brazilian_stem(w)
    return w if r is None else r


VECS = [
    ("boa", "boa"), ("boainain", "boainain"), ("boas", "boas"),
    ("bôas", "boas"), ("boassu", "boassu"), ("boataria", "boat"),
    ("boate", "boat"), ("boates", "boat"), ("boatos", "boat"),
    ("bob", "bob"), ("boba", "bob"), ("bobagem", "bobag"),
    ("bobagens", "bobagens"), ("bobalhões", "bobalho"),
    ("bobear", "bob"), ("bobeira", "bobeir"), ("bobinho", "bobinh"),
    ("bobinhos", "bobinh"), ("bobo", "bob"), ("bobs", "bobs"),
    ("boca", "boc"), ("bocadas", "boc"), ("bocadinho", "bocadinh"),
    ("bocado", "boc"), ("bocaiúva", "bocaiuv"), ("boçal", "bocal"),
    ("bocarra", "bocarr"), ("bocas", "boc"), ("bode", "bod"),
    ("bodoque", "bodoqu"), ("body", "body"), ("boeing", "boeing"),
    ("boem", "boem"), ("boemia", "boem"), ("boêmio", "boemi"),
    ("bogotá", "bogot"), ("boi", "boi"), ("bóia", "boi"),
    ("boiando", "boi"),
    ("quiabo", "quiab"), ("quicaram", "quic"), ("quickly", "quickly"),
    ("quieto", "quiet"), ("quietos", "quiet"), ("quilate", "quilat"),
    ("quilates", "quilat"), ("quilinhos", "quilinh"), ("quilo", "quil"),
    ("quilombo", "quilomb"), ("quilométricas", "quilometr"),
    ("quilométricos", "quilometr"), ("quilômetro", "quilometr"),
    ("quilômetros", "quilometr"), ("quilos", "quil"),
    ("quimica", "quimic"), ("quimicas", "quimic"),
    ("quimico", "quimic"), ("quimicos", "quimic"),
    ("quimioterapia", "quimioterap"),
    ("quimioterápicos", "quimioterap"), ("quimono", "quimon"),
    ("quincas", "quinc"), ("quinhão", "quinha"),
    ("quinhentos", "quinhent"), ("quinn", "quinn"), ("quino", "quin"),
    ("quinta", "quint"), ("quintal", "quintal"),
    ("quintana", "quintan"), ("quintanilha", "quintanilh"),
    ("quintão", "quinta"), ("quintessência", "quintessente"),
    ("quintino", "quintin"), ("quinto", "quint"),
    ("quintos", "quint"), ("quintuplicou", "quintuplic"),
    ("quinze", "quinz"), ("quinzena", "quinzen"),
]


@pytest.mark.parametrize("w,want", VECS)
def test_brazilian(w, want):
    assert st(w) == want


def test_non_indexable_returns_none():
    assert brazilian_stem("ab") is None
    assert brazilian_stem("x" * 30) is None
