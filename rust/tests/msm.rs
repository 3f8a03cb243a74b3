//! Integration test reproducing the reference's Rust oracle flow
//! (`/root/reference/tests/test.rs:50-112`): generate random points and
//! scalars, run MSM through the native session ABI, reconstruct the
//! Jacobian result from the returned bytes, and compare against an
//! independent CPU oracle.
//!
//! The reference uses arkworks as the oracle; this test carries its own
//! minimal BN254 big-int/EC implementation (Montgomery 4x64 CIOS, complete
//! Renes-Costello-Batina projective addition) so `cargo test` runs with no
//! dependencies.  Random base points are generated as k_i * G, which makes
//! the MSM oracle a single scalar multiplication:
//!     sum_i s_i * (k_i G) = (sum_i s_i k_i mod r) * G.
//!
//! By default the session runs the in-process CPU host pipeline; set
//! PANDA_RUST_ENGINE=1 to route through the accelerated TPU/JAX engine
//! worker instead (requires python3 + jax in the environment).

use panda_tpu::{CoordType, Session, Target};

// ---------------------------------------------------------------------------
// Minimal 4x64-limb Montgomery field arithmetic (R = 2^256)
// ---------------------------------------------------------------------------

#[derive(Clone, Copy)]
struct Fq {
    m: [u64; 4],   // modulus
    inv: u64,      // -m^-1 mod 2^64
    r1: [u64; 4],  // R mod m   (Montgomery form of 1)
    r2: [u64; 4],  // R^2 mod m (to_mont multiplier)
}

fn ge(a: &[u64; 4], b: &[u64; 4]) -> bool {
    for i in (0..4).rev() {
        if a[i] != b[i] {
            return a[i] > b[i];
        }
    }
    true
}

fn sub_raw(a: &[u64; 4], b: &[u64; 4]) -> [u64; 4] {
    let mut out = [0u64; 4];
    let mut borrow = 0u64;
    for i in 0..4 {
        let (d1, b1) = a[i].overflowing_sub(b[i]);
        let (d2, b2) = d1.overflowing_sub(borrow);
        out[i] = d2;
        borrow = (b1 as u64) + (b2 as u64);
    }
    out
}

fn add_raw(a: &[u64; 4], b: &[u64; 4]) -> ([u64; 4], u64) {
    let mut out = [0u64; 4];
    let mut carry = 0u64;
    for i in 0..4 {
        let s = a[i] as u128 + b[i] as u128 + carry as u128;
        out[i] = s as u64;
        carry = (s >> 64) as u64;
    }
    (out, carry)
}

impl Fq {
    fn new(m: [u64; 4]) -> Fq {
        // inv = -m^-1 mod 2^64 by Newton iteration.
        let mut x = 1u64;
        for _ in 0..6 {
            x = x.wrapping_mul(2u64.wrapping_sub(m[0].wrapping_mul(x)));
        }
        let inv = x.wrapping_neg();
        // r1 = 2^256 mod m: start from 2^255 mod m-ish by doubling 1.
        let mut r1 = [1u64, 0, 0, 0];
        for _ in 0..256 {
            let (d, carry) = add_raw(&r1, &r1);
            r1 = d;
            if carry == 1 || ge(&r1, &m) {
                r1 = sub_raw(&r1, &m);
            }
        }
        // r2 = 2^512 mod m by doubling r1 another 256 times.
        let mut r2 = r1;
        for _ in 0..256 {
            let (d, carry) = add_raw(&r2, &r2);
            r2 = d;
            if carry == 1 || ge(&r2, &m) {
                r2 = sub_raw(&r2, &m);
            }
        }
        Fq { m, inv, r1, r2 }
    }

    /// CIOS Montgomery multiplication: a*b*R^-1 mod m.
    fn mul(&self, a: &[u64; 4], b: &[u64; 4]) -> [u64; 4] {
        let mut t = [0u64; 6];
        for i in 0..4 {
            let mut carry = 0u64;
            for j in 0..4 {
                let s = t[j] as u128 + a[i] as u128 * b[j] as u128 + carry as u128;
                t[j] = s as u64;
                carry = (s >> 64) as u64;
            }
            let s = t[4] as u128 + carry as u128;
            t[4] = s as u64;
            t[5] = (s >> 64) as u64;
            let mm = t[0].wrapping_mul(self.inv);
            let s = t[0] as u128 + mm as u128 * self.m[0] as u128;
            let mut carry = (s >> 64) as u64;
            for j in 1..4 {
                let s = t[j] as u128 + mm as u128 * self.m[j] as u128 + carry as u128;
                t[j - 1] = s as u64;
                carry = (s >> 64) as u64;
            }
            let s = t[4] as u128 + carry as u128;
            t[3] = s as u64;
            t[4] = t[5] + ((s >> 64) as u64);
            t[5] = 0;
        }
        let mut out = [t[0], t[1], t[2], t[3]];
        if t[4] == 1 || ge(&out, &self.m) {
            out = sub_raw(&out, &self.m);
        }
        out
    }

    fn add(&self, a: &[u64; 4], b: &[u64; 4]) -> [u64; 4] {
        let (mut d, carry) = add_raw(a, b);
        if carry == 1 || ge(&d, &self.m) {
            d = sub_raw(&d, &self.m);
        }
        d
    }

    fn sub(&self, a: &[u64; 4], b: &[u64; 4]) -> [u64; 4] {
        if ge(a, b) && a != b {
            sub_raw(a, b)
        } else if a == b {
            [0; 4]
        } else {
            let t = sub_raw(b, a);
            sub_raw(&self.m, &t)
        }
    }

    fn to_mont(&self, a: &[u64; 4]) -> [u64; 4] {
        self.mul(a, &self.r2)
    }

    fn from_mont(&self, a: &[u64; 4]) -> [u64; 4] {
        self.mul(a, &[1, 0, 0, 0])
    }

    /// a^e for a in Montgomery form (e a plain 4-limb integer).
    fn pow(&self, a: &[u64; 4], e: &[u64; 4]) -> [u64; 4] {
        let mut acc = self.r1;
        let mut started = false;
        for i in (0..256).rev() {
            if started {
                acc = self.mul(&acc, &acc);
            }
            if (e[i / 64] >> (i % 64)) & 1 == 1 {
                if started {
                    acc = self.mul(&acc, a);
                } else {
                    acc = *a;
                    started = true;
                }
            }
        }
        if started {
            acc
        } else {
            self.r1
        }
    }

    /// Montgomery-domain inverse via Fermat (a != 0).
    fn inv(&self, a: &[u64; 4]) -> [u64; 4] {
        let two = [2u64, 0, 0, 0];
        let e = sub_raw(&self.m, &two); // m - 2
        self.pow(a, &e)
    }
}

// ---------------------------------------------------------------------------
// BN254 G1 with complete RCB projective formulas (Montgomery domain)
// ---------------------------------------------------------------------------

const BN254_P: [u64; 4] = [
    0x3c208c16d87cfd47,
    0x97816a916871ca8d,
    0xb85045b68181585d,
    0x30644e72e131a029,
];
const BN254_R: [u64; 4] = [
    0x43e1f593f0000001,
    0x2833e84879b97091,
    0xb85045b68181585d,
    0x30644e72e131a029,
];

#[derive(Clone, Copy, PartialEq)]
struct Pt {
    x: [u64; 4],
    y: [u64; 4],
    z: [u64; 4],
}

struct CurveCtx {
    fp: Fq,
    fr: Fq,
    b3: [u64; 4], // 3*b = 9 in Montgomery form
    g: Pt,        // generator (1, 2), Montgomery
}

impl CurveCtx {
    fn bn254() -> CurveCtx {
        let fp = Fq::new(BN254_P);
        let fr = Fq::new(BN254_R);
        let b3 = fp.to_mont(&[9, 0, 0, 0]);
        let g = Pt {
            x: fp.to_mont(&[1, 0, 0, 0]),
            y: fp.to_mont(&[2, 0, 0, 0]),
            z: fp.r1,
        };
        CurveCtx { fp, fr, b3, g }
    }

    fn identity(&self) -> Pt {
        Pt { x: [0; 4], y: self.fp.r1, z: [0; 4] }
    }

    /// Complete projective addition, RCB 2015 Algorithm 7 (a = 0) — the
    /// same formula the library's device path uses (curves/point.py).
    fn add(&self, p: &Pt, q: &Pt) -> Pt {
        let f = &self.fp;
        let t0 = f.mul(&p.x, &q.x);
        let t1 = f.mul(&p.y, &q.y);
        let t2 = f.mul(&p.z, &q.z);
        let t3 = f.sub(
            &f.mul(&f.add(&p.x, &p.y), &f.add(&q.x, &q.y)),
            &f.add(&t0, &t1),
        );
        let t4 = f.sub(
            &f.mul(&f.add(&p.y, &p.z), &f.add(&q.y, &q.z)),
            &f.add(&t1, &t2),
        );
        let t5 = f.sub(
            &f.mul(&f.add(&p.x, &p.z), &f.add(&q.x, &q.z)),
            &f.add(&t0, &t2),
        );
        let t0 = f.add(&f.add(&t0, &t0), &t0); // 3 X1X2
        let t2 = f.mul(&self.b3, &t2);
        let z3 = f.add(&t1, &t2);
        let t1 = f.sub(&t1, &t2);
        let t5 = f.mul(&self.b3, &t5);
        let x3 = f.sub(&f.mul(&t3, &t1), &f.mul(&t4, &t5));
        let y3 = f.add(&f.mul(&t1, &z3), &f.mul(&t5, &t0));
        let z3 = f.add(&f.mul(&z3, &t4), &f.mul(&t0, &t3));
        Pt { x: x3, y: y3, z: z3 }
    }

    /// MSB-first double-and-add (complete add throughout).
    fn scalar_mul(&self, p: &Pt, k: &[u64; 4]) -> Pt {
        let mut acc = self.identity();
        for i in (0..256).rev() {
            acc = self.add(&acc, &acc);
            if (k[i / 64] >> (i % 64)) & 1 == 1 {
                acc = self.add(&acc, p);
            }
        }
        acc
    }

    /// Projective (Montgomery) -> affine plain-integer coordinates.
    fn to_affine(&self, p: &Pt) -> Option<([u64; 4], [u64; 4])> {
        if p.z == [0; 4] {
            return None;
        }
        let zi = self.fp.inv(&p.z);
        let x = self.fp.from_mont(&self.fp.mul(&p.x, &zi));
        let y = self.fp.from_mont(&self.fp.mul(&p.y, &zi));
        Some((x, y))
    }
}

// ---------------------------------------------------------------------------
// Byte codec (wire form = Montgomery representation, LE — utils.rs contract)
// ---------------------------------------------------------------------------

fn limbs_to_le(l: &[u64; 4]) -> [u8; 32] {
    let mut out = [0u8; 32];
    for i in 0..4 {
        out[8 * i..8 * i + 8].copy_from_slice(&l[i].to_le_bytes());
    }
    out
}

fn le_to_limbs(b: &[u8]) -> [u64; 4] {
    let mut l = [0u64; 4];
    for i in 0..4 {
        l[i] = u64::from_le_bytes(b[8 * i..8 * i + 8].try_into().unwrap());
    }
    l
}

struct XorShift(u64);

impl XorShift {
    fn next(&mut self) -> u64 {
        let mut x = self.0;
        x ^= x << 13;
        x ^= x >> 7;
        x ^= x << 17;
        self.0 = x;
        x.wrapping_mul(0x2545F4914F6CDD1D)
    }

    /// Uniform-ish scalar below the field modulus.
    fn field_el(&mut self, f: &Fq) -> [u64; 4] {
        loop {
            let mut v = [self.next(), self.next(), self.next(), self.next()];
            v[3] &= (1u64 << 62) - 1; // < 2^254
            if !ge(&v, &f.m) {
                return v;
            }
        }
    }
}

/// Random points/scalars + their byte blobs (the reference's
/// `generate_points_scalars`, tests/test.rs:18-47, minus arkworks).
fn generate(
    cv: &CurveCtx,
    rng: &mut XorShift,
    n: usize,
) -> (Vec<[u64; 4]>, Vec<[u64; 4]>, Vec<u8>, Vec<u8>) {
    let mut ks = Vec::with_capacity(n);
    let mut ss = Vec::with_capacity(n);
    let mut bases = Vec::with_capacity(n * 64);
    let mut scalars = Vec::with_capacity(n * 32);
    for _ in 0..n {
        let k = rng.field_el(&cv.fr);
        let s = rng.field_el(&cv.fr);
        let p = cv.scalar_mul(&cv.g, &k);
        let (ax, ay) = cv.to_affine(&p).expect("k*G != identity");
        // wire form: Montgomery-representation bytes
        bases.extend_from_slice(&limbs_to_le(&cv.fp.to_mont(&ax)));
        bases.extend_from_slice(&limbs_to_le(&cv.fp.to_mont(&ay)));
        scalars.extend_from_slice(&limbs_to_le(&cv.fr.to_mont(&s)));
        ks.push(k);
        ss.push(s);
    }
    (ks, ss, scalars, bases)
}

/// Oracle affine result: (sum_i s_i k_i mod r) * G.
fn oracle_affine(cv: &CurveCtx, ks: &[[u64; 4]], ss: &[[u64; 4]]) -> ([u64; 4], [u64; 4]) {
    let mut e = [0u64; 4]; // Montgomery accumulator of sum s_i k_i
    for (k, s) in ks.iter().zip(ss) {
        let prod = cv.fr.mul(&cv.fr.to_mont(k), &cv.fr.to_mont(s));
        e = cv.fr.add(&e, &prod);
    }
    let e_plain = cv.fr.from_mont(&e);
    let p = cv.scalar_mul(&cv.g, &e_plain);
    cv.to_affine(&p).expect("oracle result is not the identity")
}

/// Reconstruct affine coordinates from the 96-byte Jacobian result blob
/// (x = X/Z^2, y = Y/Z^3), as the reference test does from its returned
/// bytes (tests/test.rs:87-108).
fn affine_from_jacobian_blob(cv: &CurveCtx, blob: &[u8]) -> Option<([u64; 4], [u64; 4])> {
    let xm = le_to_limbs(&blob[0..32]);
    let ym = le_to_limbs(&blob[32..64]);
    let zm = le_to_limbs(&blob[64..96]);
    if zm == [0; 4] {
        return None;
    }
    let f = &cv.fp;
    let zi = f.inv(&zm);
    let zi2 = f.mul(&zi, &zi);
    let zi3 = f.mul(&zi2, &zi);
    Some((
        f.from_mont(&f.mul(&xm, &zi2)),
        f.from_mont(&f.mul(&ym, &zi3)),
    ))
}

fn session_for_test() -> Session {
    let s = Session::new("bn254").expect("session");
    if std::env::var("PANDA_RUST_ENGINE").as_deref() == Ok("1") {
        s.set_execution_target(Target::Engine).unwrap();
        s.engine_warmup().expect("engine worker spawn");
    }
    s
}

#[test]
fn msm_bn254_correctness() {
    // Reference flow: k in a size sweep, random inputs, oracle compare
    // (tests/test.rs:51 sweeps k=10..=20 on the device; the host path
    // test sweeps 10..=16; here 2^8 and 2^10 keep the pure-Rust point
    // generation quick while exercising multi-window Pippenger).
    let cv = CurveCtx::bn254();
    let mut rng = XorShift(0x9E3779B97F4A7C15);
    let s = session_for_test();
    for log_n in [8usize, 10] {
        let n = 1usize << log_n;
        let (ks, ss, scalars, bases) = generate(&cv, &mut rng, n);
        let blob = s.msm(&scalars, &bases).expect("msm");
        let got = affine_from_jacobian_blob(&cv, &blob).expect("nonzero result");
        let want = oracle_affine(&cv, &ks, &ss);
        assert_eq!(got, want, "MSM 2^{log_n} != oracle");
    }
}

#[test]
fn msm_bn254_cached_inputs_match_fresh() {
    let cv = CurveCtx::bn254();
    let mut rng = XorShift(0xDEADBEEFCAFEF00D);
    let s = session_for_test();
    let n = 1usize << 8;
    let (_, _, scalars, bases) = generate(&cv, &mut rng, n);
    let fresh = s.msm(&scalars, &bases).expect("msm");
    let bidx = s.cache_bases(&bases).expect("cache_bases");
    let sidx = s.cache_scalars(&scalars).expect("cache_scalars");
    let via_bases = s.msm_cached(Err(&scalars), Ok(bidx)).unwrap();
    let via_both = s.msm_cached(Ok(sidx), Ok(bidx)).unwrap();
    assert_eq!(fresh, via_bases, "cached-bases result differs");
    assert_eq!(fresh, via_both, "cached-input result differs");
}

#[test]
fn msm_bn254_projective_config() {
    // set_config(Projective): result is (X, Y, Z) homogeneous; affine
    // reconstruction divides by Z once.
    let cv = CurveCtx::bn254();
    let mut rng = XorShift(0x123456789ABCDEF1);
    let s = session_for_test();
    s.set_config(CoordType::Projective).unwrap();
    let n = 1usize << 8;
    let (ks, ss, scalars, bases) = generate(&cv, &mut rng, n);
    let blob = s.msm(&scalars, &bases).expect("msm");
    let pm = Pt {
        x: le_to_limbs(&blob[0..32]),
        y: le_to_limbs(&blob[32..64]),
        z: le_to_limbs(&blob[64..96]),
    };
    let got = cv.to_affine(&pm).expect("nonzero");
    let want = oracle_affine(&cv, &ks, &ss);
    assert_eq!(got, want, "projective-config MSM != oracle");
}

#[test]
fn ntt_bn254_roundtrip() {
    // NTT then INTT through the session ABI is the identity on wire bytes
    // (the reference's in-place ping-pong contract, unit.rs:418-479).
    let cv = CurveCtx::bn254();
    let mut rng = XorShift(0xA5A5A5A55A5A5A5A);
    let s = session_for_test();
    let log_n = 8u32;
    let n = 1usize << log_n;
    let mut data = Vec::with_capacity(n * 32);
    for _ in 0..n {
        let v = rng.field_el(&cv.fr);
        data.extend_from_slice(&limbs_to_le(&cv.fr.to_mont(&v)));
    }
    let orig = data.clone();
    s.ntt(&mut data, log_n, None, false).expect("ntt");
    assert_ne!(data, orig, "forward NTT must change the data");
    s.ntt(&mut data, log_n, None, true).expect("intt");
    assert_eq!(data, orig, "INTT(NTT(x)) != x");
}

#[test]
fn error_codes_surface() {
    // Truncated scalars -> INVALID_CONFIGURATION (5), mirroring the byte
    // API probes in the Python test suite.
    let s = session_for_test();
    let err = s.msm(&[0u8; 7], &[0u8; 64]).unwrap_err();
    assert!(err.contains("5"), "expected INVALID_CONFIGURATION, got {err}");
}
