"""The single-execution streaming flagship path must produce exactly
the same triple set as the composable pipeline."""

import pytest

from ferenda_ray.pipelines.corpus import pages_dataset
from ferenda_ray.pipelines.kg import kg_pipeline, kg_triples_streaming


@pytest.mark.usefixtures("ray_session")
def test_streaming_equals_composable(sf_smoke):
    a = kg_pipeline(sf_dir=sf_smoke)["triples"].to_pandas()
    b = kg_triples_streaming(pages_dataset(sf_smoke)).to_pandas()
    key = ["subj", "pred", "obj", "obj_is_literal", "obj_lang"]
    sa = set(map(tuple, a[key].values))
    sb = set(map(tuple, b[key].values))
    assert sa == sb
    assert len(a) == len(b)
