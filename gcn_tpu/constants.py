"""Vocabulary / tag-set constants for TACRED.

These tables reproduce the id assignments of the reference
(``/root/reference/utils/constant.py``) exactly — they are load-bearing for
metric parity.  The dependency-relation table uses a *banded* id scheme
(reference ``utils/constant.py:12-17,29``):

* ids ``0..41``  — PAD, UNK and the 40 forward dependency relations,
* ids ``42..83`` — the same relations reversed (``id + DEPREL_FORWARD_BOUND``),
* id  ``84``     — the self-loop pseudo-relation.

Rather than hard-coding the 85-entry table, we generate the reverse band and
self-loop id from the forward relation list; the resulting mapping is
asserted (in tests) to be identical to the reference table.
"""

from __future__ import annotations

EMB_INIT_RANGE = 1.0

PAD_TOKEN = "<PAD>"
PAD_ID = 0
UNK_TOKEN = "<UNK>"
UNK_ID = 1
VOCAB_PREFIX = [PAD_TOKEN, UNK_TOKEN]

SELF_LOOP = "self_loop"
# Forward deprel ids occupy [0, 42); reverse ids are forward + 42; 84 = self loop.
DEPREL_FORWARD_BOUND = 42
DEPREL_REVERSE_BOUND = 84
SELF_LOOP_INDEX = 84

# The 40 forward dependency relations in reference id order
# (utils/constant.py:29, ids 2..41).
_DEPREL_NAMES = [
    "punct", "compound", "case", "nmod", "det", "nsubj", "amod", "conj",
    "dobj", "ROOT", "cc", "nmod:poss", "mark", "advmod", "appos", "nummod",
    "dep", "ccomp", "aux", "advcl", "acl:relcl", "xcomp", "cop", "acl",
    "auxpass", "nsubjpass", "nmod:tmod", "neg", "compound:prt", "mwe",
    "parataxis", "root", "nmod:npmod", "expl", "csubj", "cc:preconj",
    "iobj", "det:predet", "discourse", "csubjpass",
]


def _build_deprel_table() -> dict:
    forward = {PAD_TOKEN: 0, UNK_TOKEN: 1}
    for i, name in enumerate(_DEPREL_NAMES):
        forward[name] = 2 + i
    table = dict(forward)
    for name, idx in forward.items():
        table[name + "_reverse"] = idx + DEPREL_FORWARD_BOUND
    table[SELF_LOOP] = SELF_LOOP_INDEX
    return table


DEPREL_TO_ID = _build_deprel_table()

SUBJ_NER_TO_ID = {PAD_TOKEN: 0, UNK_TOKEN: 1, "ORGANIZATION": 2, "PERSON": 3}

OBJ_NER_TO_ID = {
    PAD_TOKEN: 0, UNK_TOKEN: 1, "PERSON": 2, "ORGANIZATION": 3, "DATE": 4,
    "NUMBER": 5, "TITLE": 6, "COUNTRY": 7, "LOCATION": 8, "CITY": 9,
    "MISC": 10, "STATE_OR_PROVINCE": 11, "DURATION": 12, "NATIONALITY": 13,
    "CAUSE_OF_DEATH": 14, "CRIMINAL_CHARGE": 15, "RELIGION": 16, "URL": 17,
    "IDEOLOGY": 18,
}

NER_TO_ID = {
    PAD_TOKEN: 0, UNK_TOKEN: 1, "O": 2, "PERSON": 3, "ORGANIZATION": 4,
    "LOCATION": 5, "DATE": 6, "NUMBER": 7, "MISC": 8, "DURATION": 9,
    "MONEY": 10, "PERCENT": 11, "ORDINAL": 12, "TIME": 13, "SET": 14,
}

POS_TO_ID = {
    PAD_TOKEN: 0, UNK_TOKEN: 1, "NNP": 2, "NN": 3, "IN": 4, "DT": 5,
    ",": 6, "JJ": 7, "NNS": 8, "VBD": 9, "CD": 10, "CC": 11, ".": 12,
    "RB": 13, "VBN": 14, "PRP": 15, "TO": 16, "VB": 17, "VBG": 18,
    "VBZ": 19, "PRP$": 20, ":": 21, "POS": 22, "''": 23, "``": 24,
    "-RRB-": 25, "-LRB-": 26, "VBP": 27, "MD": 28, "NNPS": 29, "WP": 30,
    "WDT": 31, "WRB": 32, "RP": 33, "JJR": 34, "JJS": 35, "$": 36,
    "FW": 37, "RBR": 38, "SYM": 39, "EX": 40, "RBS": 41, "WP$": 42,
    "PDT": 43, "LS": 44, "UH": 45, "#": 46,
}

NEGATIVE_LABEL = "no_relation"

LABEL_TO_ID = {
    "no_relation": 0, "per:title": 1, "org:top_members/employees": 2,
    "per:employee_of": 3, "org:alternate_names": 4,
    "org:country_of_headquarters": 5, "per:countries_of_residence": 6,
    "org:city_of_headquarters": 7, "per:cities_of_residence": 8,
    "per:age": 9, "per:stateorprovinces_of_residence": 10, "per:origin": 11,
    "org:subsidiaries": 12, "org:parents": 13, "per:spouse": 14,
    "org:stateorprovince_of_headquarters": 15, "per:children": 16,
    "per:other_family": 17, "per:alternate_names": 18, "org:members": 19,
    "per:siblings": 20, "per:schools_attended": 21, "per:parents": 22,
    "per:date_of_death": 23, "org:member_of": 24, "org:founded_by": 25,
    "org:website": 26, "per:cause_of_death": 27,
    "org:political/religious_affiliation": 28, "org:founded": 29,
    "per:city_of_death": 30, "org:shareholders": 31,
    "org:number_of_employees/members": 32, "per:date_of_birth": 33,
    "per:city_of_birth": 34, "per:charges": 35,
    "per:stateorprovince_of_death": 36, "per:religion": 37,
    "per:stateorprovince_of_birth": 38, "per:country_of_birth": 39,
    "org:dissolved": 40, "per:country_of_death": 41,
}

ID_TO_LABEL = {v: k for k, v in LABEL_TO_ID.items()}

INFINITY_NUMBER = 1e12

NUM_DEPREL = len(DEPREL_TO_ID)  # 85
NUM_POS = len(POS_TO_ID)        # 47
NUM_NER = len(NER_TO_ID)        # 15
NUM_CLASS = len(LABEL_TO_ID)    # 42
