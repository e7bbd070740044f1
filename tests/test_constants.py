"""The generated deprel band table must match the reference's hard-coded one."""

from gcn_tpu import constants, constants_semeval


def test_deprel_table_shape():
    assert len(constants.DEPREL_TO_ID) == 85
    assert constants.DEPREL_TO_ID["<PAD>"] == 0
    assert constants.DEPREL_TO_ID["<UNK>"] == 1
    assert constants.DEPREL_TO_ID["punct"] == 2
    assert constants.DEPREL_TO_ID["csubjpass"] == 41
    assert constants.DEPREL_TO_ID["<PAD>_reverse"] == 42
    assert constants.DEPREL_TO_ID["punct_reverse"] == 44
    assert constants.DEPREL_TO_ID["csubjpass_reverse"] == 83
    assert constants.DEPREL_TO_ID["self_loop"] == 84


def test_reverse_band_offset():
    fwd = {
        k: v for k, v in constants.DEPREL_TO_ID.items()
        if v < constants.DEPREL_FORWARD_BOUND
    }
    for name, idx in fwd.items():
        assert constants.DEPREL_TO_ID[name + "_reverse"] == idx + 42


def test_tacred_tables():
    assert len(constants.POS_TO_ID) == 47
    assert len(constants.NER_TO_ID) == 15
    assert len(constants.LABEL_TO_ID) == 42
    assert constants.LABEL_TO_ID["no_relation"] == 0
    assert constants.LABEL_TO_ID["per:country_of_death"] == 41


def test_semeval_tables():
    assert len(constants_semeval.DEPREL_TO_ID) == 42
    assert "punct_reverse" not in constants_semeval.DEPREL_TO_ID
    assert len(constants_semeval.LABEL_TO_ID) == 10
    assert constants_semeval.POS_TO_ID["pad"] == 47
    assert constants_semeval.NEGATIVE_LABEL == "Other"
    # forward ids agree with TACRED so deprel features transfer
    for k, v in constants_semeval.DEPREL_TO_ID.items():
        assert constants.DEPREL_TO_ID[k] == v
