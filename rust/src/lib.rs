//! Rust bindings for the panda_tpu native session C ABI.
//!
//! The reference exposes its GPU library to Rust provers through ~40
//! hand-written `extern "C"` declarations plus a manager object
//! (`/root/reference/src/gpu_ffi/binding.rs:3-115`,
//! `src/gpu_manager/wrapper.rs:8-353`).  panda_tpu's native surface is the
//! *session* API (`panda_tpu/native/panda_host.cpp`): a session pins a
//! curve, holds cached bases/scalars blobs, carries the result-coordinate
//! config, and dispatches either to the in-process CPU host pipeline or to
//! the accelerated TPU engine (a worker subprocess speaking a pipe
//! protocol — results byte-identical to the Python byte API).
//!
//! Byte contracts (identical to the reference's, `utils.rs:1-61`):
//! * field element: `n_bytes` little-endian bytes, wire-Montgomery form
//!   (value * 2^(8*n_bytes) mod p);
//! * affine base point: x bytes then y bytes;
//! * MSM result: 3 field elements (Jacobian X, Y, Z by default; homogeneous
//!   projective with `set_config(1)`).

use std::ffi::{c_char, c_int, c_long, c_uint, CString};

#[allow(non_camel_case_types)]
pub enum panda_session {}

extern "C" {
    pub fn panda_get_device_number(count: *mut c_int) -> c_int;
    pub fn panda_session_create(curve_name: *const c_char) -> *mut panda_session;
    pub fn panda_session_destroy(s: *mut panda_session);
    pub fn panda_session_set_config(s: *mut panda_session, coord_type: c_int) -> c_int;
    pub fn panda_session_set_execution_target(s: *mut panda_session, target: c_int) -> c_int;
    pub fn panda_session_engine_warmup(s: *mut panda_session) -> c_int;
    pub fn panda_session_cache_bases(
        s: *mut panda_session,
        bases: *const u8,
        blen: usize,
    ) -> c_long;
    pub fn panda_session_cache_scalars(
        s: *mut panda_session,
        scalars: *const u8,
        slen: usize,
    ) -> c_long;
    pub fn panda_session_msm(
        s: *mut panda_session,
        scalars: *const u8,
        slen: usize,
        bases: *const u8,
        blen: usize,
        out: *mut u8,
    ) -> c_int;
    pub fn panda_session_msm_cached(
        s: *mut panda_session,
        scalars_index: c_long,
        bases_index: c_long,
        scalars: *const u8,
        slen: usize,
        bases: *const u8,
        blen: usize,
        out: *mut u8,
    ) -> c_int;
    pub fn panda_session_ntt(
        s: *mut panda_session,
        data: *mut u8,
        len: usize,
        log_n: c_uint,
        omega: *const u8,
        inverse: c_int,
    ) -> c_int;
}

/// PandaError codes (`panda_tpu/runtime/errors.py`, mirroring the
/// reference's `panda_error` / `PandaGpuError` enums).
#[derive(Debug, Clone, Copy, PartialEq, Eq)]
pub struct PandaError(pub i32);

impl PandaError {
    pub const SUCCESS: i32 = 0;
    pub const INVALID_VALUE: i32 = 1;
    pub const MEMORY_ALLOCATION: i32 = 2;
    pub const NOT_READY: i32 = 3;
    pub const INVALID_DEVICE: i32 = 4;
    pub const INVALID_CONFIGURATION: i32 = 5;
    pub const UNSUPPORTED_CURVE: i32 = 6;
    pub const UNSUPPORTED_SIZE: i32 = 7;
    pub const NOT_INITIALIZED: i32 = 8;
    pub const INTERNAL: i32 = 9;
}

/// Execution targets (`panda_host.cpp::panda_execution_target`).
#[derive(Debug, Clone, Copy, PartialEq, Eq)]
pub enum Target {
    /// In-process CPU host pipeline (the reference's `msm_host.cuh` analog).
    Host = 0,
    /// Accelerated TPU engine via the worker subprocess.
    Engine = 1,
}

/// Result coordinate types (`gpu_ffi/common.rs:170-173` analog).
#[derive(Debug, Clone, Copy, PartialEq, Eq)]
pub enum CoordType {
    Jacobian = 0,
    Projective = 1,
}

/// Safe wrapper over a native session — the Rust-facing analog of the
/// reference's `PandaGpuManager` (`wrapper.rs:8-353`).
pub struct Session {
    h: *mut panda_session,
    /// field-element byte width of the session's curve base field
    pub fp_bytes: usize,
    /// field-element byte width of the scalar field
    pub fr_bytes: usize,
}

fn check(rc: c_int, what: &str) -> Result<(), String> {
    if rc == 0 {
        Ok(())
    } else {
        Err(format!("{what} failed: PandaError {rc}"))
    }
}

impl Session {
    /// Create a session for `curve` ("bn254", "bls12_377", "bls12_381").
    /// Field widths are fixed per curve (32/32, 48/32, 48/32 bytes).
    pub fn new(curve: &str) -> Result<Session, String> {
        let (fp_bytes, fr_bytes) = match curve {
            "bn254" => (32, 32),
            "bls12_377" | "bls12_381" => (48, 32),
            _ => return Err(format!("unknown curve {curve}")),
        };
        let name = CString::new(curve).map_err(|e| e.to_string())?;
        let h = unsafe { panda_session_create(name.as_ptr()) };
        if h.is_null() {
            return Err(format!("panda_session_create({curve}) failed"));
        }
        Ok(Session { h, fp_bytes, fr_bytes })
    }

    pub fn set_config(&self, coord: CoordType) -> Result<(), String> {
        check(
            unsafe { panda_session_set_config(self.h, coord as c_int) },
            "set_config",
        )
    }

    pub fn set_execution_target(&self, target: Target) -> Result<(), String> {
        check(
            unsafe { panda_session_set_execution_target(self.h, target as c_int) },
            "set_execution_target",
        )
    }

    /// Spawn + ping the engine worker now (surfaces spawn errors early).
    pub fn engine_warmup(&self) -> Result<(), String> {
        check(
            unsafe { panda_session_engine_warmup(self.h) },
            "engine_warmup",
        )
    }

    /// Cache a bases blob on the session; returns the cache index
    /// (the reference's `init_msm_cached_bases`, `wrapper.rs:154`).
    pub fn cache_bases(&self, bases: &[u8]) -> Result<i64, String> {
        let idx = unsafe { panda_session_cache_bases(self.h, bases.as_ptr(), bases.len()) };
        if idx < 0 {
            Err("cache_bases failed".into())
        } else {
            Ok(idx as i64)
        }
    }

    pub fn cache_scalars(&self, scalars: &[u8]) -> Result<i64, String> {
        let idx =
            unsafe { panda_session_cache_scalars(self.h, scalars.as_ptr(), scalars.len()) };
        if idx < 0 {
            Err("cache_scalars failed".into())
        } else {
            Ok(idx as i64)
        }
    }

    /// MSM over fresh byte blobs; returns the 3-coordinate result blob
    /// (`panda_msm_bn254_gpu` analog, `unit.rs:10`).
    pub fn msm(&self, scalars: &[u8], bases: &[u8]) -> Result<Vec<u8>, String> {
        let mut out = vec![0u8; 3 * self.fp_bytes];
        let rc = unsafe {
            panda_session_msm(
                self.h,
                scalars.as_ptr(),
                scalars.len(),
                bases.as_ptr(),
                bases.len(),
                out.as_mut_ptr(),
            )
        };
        check(rc, "msm")?;
        Ok(out)
    }

    /// MSM with cached inputs (`unit.rs:103/190/277`); `None` = fresh bytes.
    pub fn msm_cached(
        &self,
        scalars: Result<i64, &[u8]>,
        bases: Result<i64, &[u8]>,
    ) -> Result<Vec<u8>, String> {
        let (sidx, sbytes): (c_long, &[u8]) = match scalars {
            Ok(i) => (i as c_long, &[]),
            Err(b) => (-1, b),
        };
        let (bidx, bbytes): (c_long, &[u8]) = match bases {
            Ok(i) => (i as c_long, &[]),
            Err(b) => (-1, b),
        };
        let mut out = vec![0u8; 3 * self.fp_bytes];
        let rc = unsafe {
            panda_session_msm_cached(
                self.h,
                sidx,
                bidx,
                sbytes.as_ptr(),
                sbytes.len(),
                bbytes.as_ptr(),
                bbytes.len(),
                out.as_mut_ptr(),
            )
        };
        check(rc, "msm_cached")?;
        Ok(out)
    }

    /// In-place NTT/INTT over scalar-field elements
    /// (`panda_ntt_bn254_gpu` analog, `unit.rs:418`; `omega` = the v1
    /// caller-supplied-root variant, `unit.rs:481`).
    pub fn ntt(
        &self,
        data: &mut [u8],
        log_n: u32,
        omega: Option<&[u8]>,
        inverse: bool,
    ) -> Result<(), String> {
        let om = match omega {
            Some(o) => {
                if o.len() != self.fr_bytes {
                    return Err("omega byte width mismatch".into());
                }
                o.as_ptr()
            }
            None => std::ptr::null(),
        };
        let rc = unsafe {
            panda_session_ntt(
                self.h,
                data.as_mut_ptr(),
                data.len(),
                log_n,
                om,
                inverse as c_int,
            )
        };
        check(rc, "ntt")
    }

    pub fn device_count() -> i32 {
        let mut n: c_int = 0;
        unsafe { panda_get_device_number(&mut n) };
        n
    }
}

impl Drop for Session {
    fn drop(&mut self) {
        unsafe { panda_session_destroy(self.h) };
    }
}

// The session API is thread-compatible (one session per thread), like the
// reference's manager (`wrapper.rs:20-21` declares unsafe Send/Sync; we
// only claim Send).
unsafe impl Send for Session {}
