// Oracle dump harness: compiles the *reference* dj_brdf.h (read-only,
// via -I) and prints golden values for parity tests of dj_brdf_tpu.
// This file is new code; it only calls the reference's public API.
//
// build: g++ -O2 -I/root/reference -o harness harness.cpp -lm
// usage: ./harness <subcommand> [args...]   (text output, %.9e)

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>

#define DJ_BRDF_IMPLEMENTATION 1
#define NVERBOSE 1
#include "dj_brdf.h"

using djb::vec3;
typedef djb::float_t ftype;

// deterministic direction grid shared with the python side
// (tests/oracle/__init__.py): theta in (0, 0.98*pi/2), phi in [0, 2pi)
static vec3 grid_dir(int it, int nt, int ip, int np_) {
    ftype theta = ((ftype)it + 0.5f) / (ftype)nt * (ftype)(M_PI / 2.0) * 0.98f;
    ftype phi = (ftype)ip / (ftype)np_ * (ftype)(2.0 * M_PI);
    return vec3(theta, phi);
}

// adapter exposing a microfacet BRDF with fixed params through the
// plain eval(i, o) interface (tabular ctor evaluates without params)
struct fixed_params_brdf : public djb::brdf {
    const djb::brdf &fr;
    djb::microfacet::params p;
    fixed_params_brdf(const djb::brdf &fr, const djb::microfacet::params &p)
        : fr(fr), p(p) {}
    vec3 eval(const vec3 &i, const vec3 &o, const void *) const {
        return fr.eval(i, o, &p);
    }
};

static void dump_evalp(const djb::brdf &fr, const void *param) {
    const int NT = 6, NP = 6;
    for (int a = 0; a < NT; ++a)
    for (int b = 0; b < NP; ++b)
    for (int c = 0; c < NT; ++c)
    for (int d = 0; d < NP; ++d) {
        vec3 i = grid_dir(a, NT, b, NP);
        vec3 o = grid_dir(c, NT, d, NP);
        vec3 v = fr.evalp(i, o, param);
        printf("%.9e %.9e %.9e\n", (double)v.x, (double)v.y, (double)v.z);
    }
}

static void dump_sample(const djb::microfacet &fr,
                        const djb::microfacet::params &p) {
    const int NU = 8, NT = 6;
    for (int a = 0; a < NU; ++a)
    for (int b = 0; b < NU; ++b)
    for (int c = 0; c < NT; ++c) {
        ftype u1 = ((ftype)a + 0.5f) / (ftype)NU;
        ftype u2 = ((ftype)b + 0.5f) / (ftype)NU;
        vec3 o = grid_dir(c, NT, 0, 1);
        vec3 i = fr.sample(u1, u2, o, &p);
        ftype pdf = fr.pdf(i, o, &p);
        printf("%.9e %.9e %.9e %.9e\n",
               (double)i.x, (double)i.y, (double)i.z, (double)pdf);
    }
}

static djb::microfacet *make_dist(const char *name) {
    if (!strcmp(name, "ggx")) return new djb::ggx();
    if (!strcmp(name, "beckmann")) return new djb::beckmann();
    fprintf(stderr, "unknown dist %s\n", name);
    exit(1);
}

static void dump_tabular(const djb::tabular &tab) {
    const std::vector<ftype> &p22 = tab.get_p22v();
    const std::vector<ftype> &sig = tab.get_sigmav();
    const std::vector<ftype> &cdf = tab.get_cdfv();
    const std::vector<ftype> &qf = tab.get_qfv();
    printf("p22 %d\n", (int)p22.size());
    for (size_t i = 0; i < p22.size(); ++i) printf("%.9e\n", (double)p22[i]);
    printf("sigma %d\n", (int)sig.size());
    for (size_t i = 0; i < sig.size(); ++i) printf("%.9e\n", (double)sig[i]);
    printf("cdf %d\n", (int)cdf.size());
    for (size_t i = 0; i < cdf.size(); ++i) printf("%.9e\n", (double)cdf[i]);
    printf("qf %d\n", (int)qf.size());
    for (size_t i = 0; i < qf.size(); ++i) printf("%.9e\n", (double)qf[i]);
    ftype ab, ag, dummy;
    djb::microfacet::params pb = djb::tabular::fit_beckmann_parameters(tab);
    djb::microfacet::params pg = djb::tabular::fit_ggx_parameters(tab);
    pb.get_ellipse(&ab, &dummy);
    pg.get_ellipse(&ag, &dummy);
    printf("fit_beckmann %.9e\n", (double)ab);
    printf("fit_ggx %.9e\n", (double)ag);
    // tabulated fresnel spline points
    const djb::fresnel::impl &f = tab.get_fresnel();
    const djb::fresnel::spline *sp =
        dynamic_cast<const djb::fresnel::spline *>(&f);
    if (sp) {
        const std::vector<vec3> &pts = sp->get_points();
        printf("fresnel %d\n", (int)pts.size());
        for (size_t i = 0; i < pts.size(); ++i)
            printf("%.9e %.9e %.9e\n",
                   (double)pts[i].x, (double)pts[i].y, (double)pts[i].z);
    }
}

int main(int argc, char **argv) {
    if (argc < 2) { fprintf(stderr, "need subcommand\n"); return 1; }
    const char *cmd = argv[1];

    if (!strcmp(cmd, "evalp")) {
        // evalp <dist> <a1> <a2> <phi_a> <txn> <tyn> [f0r f0g f0b]
        djb::microfacet *m = make_dist(argv[2]);
        djb::microfacet::params p =
            djb::microfacet::params::elliptic(atof(argv[3]), atof(argv[4]),
                                              atof(argv[5]));
        p.set_location((ftype)atof(argv[6]), (ftype)atof(argv[7]));
        if (argc > 10)
            m->set_fresnel(djb::fresnel::schlick(
                vec3(atof(argv[8]), atof(argv[9]), atof(argv[10]))));
        dump_evalp(*m, &p);
    } else if (!strcmp(cmd, "sample")) {
        // sample <dist> <a1> <a2> <phi_a> <txn> <tyn>
        djb::microfacet *m = make_dist(argv[2]);
        djb::microfacet::params p =
            djb::microfacet::params::elliptic(atof(argv[3]), atof(argv[4]),
                                              atof(argv[5]));
        p.set_location((ftype)atof(argv[6]), (ftype)atof(argv[7]));
        dump_sample(*m, p);
    } else if (!strcmp(cmd, "eval_merl")) {
        djb::merl merl(argv[2]);
        dump_evalp(merl, NULL);
    } else if (!strcmp(cmd, "eval_utia")) {
        djb::utia utia(argv[2]);
        dump_evalp(utia, NULL);
    } else if (!strcmp(cmd, "eval_sgd")) {
        djb::sgd sgd(argv[2]);
        dump_evalp(sgd, NULL);
    } else if (!strcmp(cmd, "eval_abc")) {
        djb::abc abc(argv[2]);
        dump_evalp(abc, NULL);
    } else if (!strcmp(cmd, "tabular")) {
        // tabular <dist> <alpha> <res>: tabulate an analytic dist
        djb::microfacet *m = make_dist(argv[2]);
        djb::microfacet::params p =
            djb::microfacet::params::isotropic(atof(argv[3]));
        fixed_params_brdf wrapped(*m, p);
        djb::tabular tab(wrapped, atoi(argv[4]));
        dump_tabular(tab);
    } else if (!strcmp(cmd, "tabular_merl")) {
        // tabular_merl <file> <res>
        djb::merl merl(argv[2]);
        djb::tabular tab(merl, atoi(argv[3]));
        dump_tabular(tab);
    } else if (!strcmp(cmd, "tabular_aniso")) {
        // tabular_aniso <dist> <a1> <a2> <phi_a> <elev> <azim>:
        // dump sampling-table queries, evalp grid, and aniso fits
        djb::microfacet *m = make_dist(argv[2]);
        djb::microfacet::params p =
            djb::microfacet::params::elliptic(atof(argv[3]), atof(argv[4]),
                                              atof(argv[5]));
        fixed_params_brdf wrapped(*m, p);
        int elev = atoi(argv[6]), azim = atoi(argv[7]);
        djb::tabular_anisotropic tab(wrapped, elev, azim);

        int ep, ap;
        const std::vector<ftype> &p22 = tab.get_p22v(&ep, &ap);
        printf("p22 %d\n", (int)p22.size());
        for (size_t i = 0; i < p22.size(); ++i)
            printf("%.9e\n", (double)p22[i]);
        const std::vector<ftype> &sig = tab.get_sigmav(&ep, &ap);
        printf("sigma %d\n", (int)sig.size());
        for (size_t i = 0; i < sig.size(); ++i)
            printf("%.9e\n", (double)sig[i]);

        const int NQ = 32;
        printf("queries %d\n", NQ * NQ);
        for (int a = 0; a < NQ; ++a)
        for (int b = 0; b < NQ; ++b) {
            ftype u = ((ftype)a + 0.5f) / NQ;
            ftype v = ((ftype)b + 0.5f) / NQ;
            ftype phi = u * 2.0 * M_PI;
            ftype theta = v * 0.5 * M_PI * 0.98;
            printf("%.9e %.9e %.9e %.9e %.9e %.9e\n",
                   (double)tab.pdf1(phi), (double)tab.cdf1(phi),
                   (double)tab.qf1(u), (double)tab.pdf2(theta, phi),
                   (double)tab.cdf2(theta, phi), (double)tab.qf2(v, phi));
        }
        ftype vals[5];
        djb::microfacet::params pb =
            djb::tabular_anisotropic::fit_beckmann_parameters(tab);
        pb.get_pdfparams(&vals[0], &vals[1], &vals[2], &vals[3], &vals[4]);
        printf("fit_beckmann %.9e %.9e %.9e %.9e %.9e\n", (double)vals[0],
               (double)vals[1], (double)vals[2], (double)vals[3],
               (double)vals[4]);
        djb::microfacet::params pg =
            djb::tabular_anisotropic::fit_ggx_parameters(tab);
        pg.get_pdfparams(&vals[0], &vals[1], &vals[2], &vals[3], &vals[4]);
        printf("fit_ggx %.9e %.9e %.9e %.9e %.9e\n", (double)vals[0],
               (double)vals[1], (double)vals[2], (double)vals[3],
               (double)vals[4]);
        printf("evalp_grid 1296\n");
        const int NT = 6, NP = 6;
        for (int a = 0; a < NT; ++a)
        for (int b = 0; b < NP; ++b)
        for (int c = 0; c < NT; ++c)
        for (int d = 0; d < NP; ++d) {
            vec3 i = grid_dir(a, NT, b, NP);
            vec3 o = grid_dir(c, NT, d, NP);
            vec3 v = tab.evalp(i, o, NULL);
            printf("%.9e %.9e %.9e\n", (double)v.x, (double)v.y, (double)v.z);
        }
        printf("ndf_sigma %d\n", NT * NP);
        for (int a = 0; a < NT; ++a)
        for (int b = 0; b < NP; ++b) {
            vec3 k = grid_dir(a, NT, b, NP);
            printf("%.9e %.9e\n", (double)tab.ndf(k), (double)tab.sigma(k));
        }
    } else if (!strcmp(cmd, "lrep_roundtrip")) {
        // lrep_roundtrip <E1> <E2> <E3> <E4> <E5>
        djb::beckmann::lrep lrep(atof(argv[2]), atof(argv[3]), atof(argv[4]),
                                 atof(argv[5]), atof(argv[6]));
        djb::microfacet::params p;
        djb::beckmann::lrep_to_params(lrep, &p);
        ftype ax, ay, rho, txn, tyn;
        p.get_pdfparams(&ax, &ay, &rho, &txn, &tyn);
        printf("%.9e %.9e %.9e %.9e %.9e\n",
               (double)ax, (double)ay, (double)rho, (double)txn, (double)tyn);
        djb::beckmann::lrep back;
        djb::beckmann::params_to_lrep(p, &back);
    } else if (!strcmp(cmd, "qf2")) {
        // qf2 <dist>: visible-slope quantiles over (u, theta_k) grid
        djb::microfacet *mm = make_dist(argv[2]);
        djb::radial *m = dynamic_cast<djb::radial *>(mm);
        const int NU = 16, NT = 8;
        for (int a = 0; a < NU; ++a)
        for (int c = 0; c < NT; ++c) {
            ftype u = ((ftype)a + 0.5f) / (ftype)NU;
            ftype theta = ((ftype)c + 0.5f) / (ftype)NT
                          * (ftype)(M_PI / 2.0) * 0.98f;
            ftype ct = cos(theta), st = sin(theta);
            ftype q2 = m->qf2_radial(u, ct, st);
            ftype q3 = m->qf3_radial(u, q2);
            printf("%.9e %.9e\n", (double)q2, (double)q3);
        }
    } else {
        fprintf(stderr, "unknown subcommand %s\n", cmd);
        return 1;
    }
    return 0;
}
