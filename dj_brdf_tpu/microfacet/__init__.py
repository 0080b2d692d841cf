from dj_brdf_tpu.microfacet.params import (
    MicrofacetParams,
    ellipse_to_pdfparams,
    pdfparams_to_ellipse,
)
from dj_brdf_tpu.microfacet.ndf import GGX, Beckmann, Tabular, TabularAnisotropic
from dj_brdf_tpu.microfacet import brdf
