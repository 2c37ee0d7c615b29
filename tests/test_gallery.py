"""The explainer-figure gallery must regenerate from live objects."""
import os


def test_generate_gallery(tmp_path):
    from qldpc_tpu.utils.gallery import generate_gallery
    paths = generate_gallery(str(tmp_path), code_name="[[72, 12, 6]]",
                             num_cycles=2, p=0.006, verbose=False)
    assert len(paths) == 15
    for p in paths:
        assert os.path.exists(p) and os.path.getsize(p) > 5000, p
    names = {os.path.basename(p) for p in paths}
    for req in ("03_syndrome_circuit.png", "09_tanner_graph.png",
                "12_decoder_performance.png"):
        assert req in names
