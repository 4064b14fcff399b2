"""Device-side FASTA decode vs host decoder parity."""

import numpy as np
import pytest

import jax.numpy as jnp

from exon_tpu.formats.fasta import FastaOptions, decode_buffer
from exon_tpu.formats.fasta_device import decode_fasta_device, split_chunks


CASES = [
    b">a desc here\nACGT\nACGT\n>b\nTTTT\n",
    b">only one\nAC\n",
    b">x\nACGT",                      # no trailing newline
    b">a\nAC\n>b two words here\nGG\n>c\nTT\n",
    b">crlf test\r\nACGT\r\n>b\r\nGG\r\n",
    b">empty seq\n>next\nAA\n",
]


@pytest.mark.parametrize("data", CASES)
def test_device_matches_host(data):
    opts = FastaOptions()
    host = decode_buffer(data, opts)
    batches = list(decode_fasta_device(data, opts))
    assert len(batches) == 1
    b = batches[0]
    assert b.num_rows_host() == host.n
    arrow = b.to_arrow()
    # host ground truth strings
    ids, seqs, descs = [], [], []
    for i in range(host.n):
        ids.append(bytes(host.name_values[host.name_offsets[i]:host.name_offsets[i + 1]]).decode())
        seqs.append(bytes(host.seq_values[host.seq_offsets[i]:host.seq_offsets[i + 1]]).decode())
        d = bytes(host.desc_values[host.desc_offsets[i]:host.desc_offsets[i + 1]]).decode()
        descs.append(d if host.desc_valid[i] else None)
    assert arrow.column("id").to_pylist() == ids
    assert arrow.column("sequence").to_pylist() == seqs
    assert arrow.column("description").to_pylist() == descs


def test_projection_sequence_only():
    b = next(decode_fasta_device(CASES[0], FastaOptions(), ["sequence"]))
    assert b.schema.names == ["sequence"]
    assert b.to_arrow().column("sequence").to_pylist() == ["ACGTACGT", "TTTT"]


def test_split_chunks_boundaries():
    data = b">a\nAAAA\n>b\nCCCC\n>c\nGGGG\n"
    spans = split_chunks(data, max_chunk=10)
    assert spans[0][0] == 0 and spans[-1][1] == len(data)
    for lo, hi in spans[1:]:
        assert data[lo:lo + 1] == b">"  # every chunk starts at a record


def test_integer_encode_device():
    b = next(decode_fasta_device(b">x\nACGTN\n",
                                 FastaOptions(sequence_data_type="integer_encode_dna")))
    col = b.column("sequence")
    assert list(np.asarray(col.values)[:5]) == [1, 2, 3, 4, 5]


def test_integer_encode_device_invalid():
    from exon_tpu.errors import InvalidSequenceError

    with pytest.raises(InvalidSequenceError):
        list(decode_fasta_device(b">x\nACGTZ\n",
                                 FastaOptions(sequence_data_type="integer_encode_dna")))
