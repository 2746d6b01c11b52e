/* Headless build stub for the vendored GLEW/GL headers: the reference's
 * --out (headless) path never executes any GL call, so every entry point is
 * an inline no-op. Types/constants cover exactly what OpticalFlow.cpp,
 * Visualization.h and SurfaceVisualization.inl reference. */
#ifndef STUB_GLEW_H
#define STUB_GLEW_H

#include <cstddef>

typedef unsigned int GLenum;
typedef unsigned int GLuint;
typedef int GLint;
typedef int GLsizei;
typedef unsigned char GLboolean;
typedef unsigned char GLubyte;
typedef float GLfloat;
typedef float GLclampf;
typedef double GLdouble;
typedef void GLvoid;
typedef ptrdiff_t GLsizeiptr;
typedef ptrdiff_t GLintptr;

enum {
  GL_FALSE = 0, GL_TRUE = 1,
  GL_AMBIENT, GL_AMBIENT_AND_DIFFUSE, GL_ARRAY_BUFFER, GL_BACK, GL_BLEND,
  GL_BLEND_DST, GL_BLEND_SRC, GL_CLAMP, GL_CLAMP_TO_BORDER, GL_COLOR_ARRAY,
  GL_COLOR_ATTACHMENT0, GL_COLOR_MATERIAL, GL_CULL_FACE, GL_DECAL,
  GL_DEPTH_ATTACHMENT, GL_DEPTH_COMPONENT, GL_DEPTH_COMPONENT24,
  GL_DEPTH_TEST, GL_DIFFUSE, GL_DYNAMIC_DRAW, GL_ELEMENT_ARRAY_BUFFER,
  GL_FILL, GL_FLOAT, GL_FRAMEBUFFER, GL_FRAMEBUFFER_COMPLETE, GL_FRONT,
  GL_FRONT_AND_BACK, GL_LIGHT0, GL_LIGHTING, GL_LIGHT_MODEL_LOCAL_VIEWER,
  GL_LIGHT_MODEL_TWO_SIDE, GL_LINE, GL_LINEAR, GL_LINE_LOOP, GL_LINE_SMOOTH,
  GL_MODELVIEW, GL_NORMAL_ARRAY, GL_ONE_MINUS_SRC_ALPHA, GL_POSITION,
  GL_PROJECTION, GL_QUADS, GL_RGB, GL_RGBA8, GL_SHININESS, GL_SPECULAR,
  GL_SRC_ALPHA, GL_STATIC_DRAW, GL_TEXTURE_2D, GL_TEXTURE_COORD_ARRAY,
  GL_TEXTURE_ENV, GL_TEXTURE_ENV_MODE, GL_TEXTURE_MAG_FILTER,
  GL_TEXTURE_MIN_FILTER, GL_TEXTURE_WRAP_S, GL_TEXTURE_WRAP_T, GL_TRIANGLES,
  GL_UNSIGNED_BYTE, GL_UNSIGNED_INT, GL_VERTEX_ARRAY, GL_VIEWPORT,
  GL_COLOR_BUFFER_BIT = 0x4000, GL_DEPTH_BUFFER_BIT = 0x0100,
  GLEW_OK = 0
};

static inline void glBegin(GLenum) {}
static inline void glBindBuffer(GLenum, GLuint) {}
static inline void glBindFramebuffer(GLenum, GLuint) {}
static inline void glBindTexture(GLenum, GLuint) {}
static inline void glBlendFunc(GLenum, GLenum) {}
static inline void glBufferData(GLenum, GLsizeiptr, const void*, GLenum) {}
static inline GLenum glCheckFramebufferStatus(GLenum) { return GL_FRAMEBUFFER_COMPLETE; }
static inline void glClear(unsigned) {}
static inline void glClearColor(GLclampf, GLclampf, GLclampf, GLclampf) {}
static inline void glColor3f(GLfloat, GLfloat, GLfloat) {}
static inline void glColor4f(GLfloat, GLfloat, GLfloat, GLfloat) {}
static inline void glColorMaterial(GLenum, GLenum) {}
static inline void glColorPointer(GLint, GLenum, GLsizei, const void*) {}
static inline void glDisable(GLenum) {}
static inline void glDisableClientState(GLenum) {}
static inline void glDrawBuffers(GLsizei, const GLenum*) {}
static inline void glDrawElements(GLenum, GLsizei, GLenum, const void*) {}
static inline void glEnable(GLenum) {}
static inline void glEnableClientState(GLenum) {}
static inline void glEnd(void) {}
static inline void glFinish(void) {}
static inline void glFlush(void) {}
static inline void glFramebufferTexture2D(GLenum, GLenum, GLenum, GLuint, GLint) {}
static inline void glGenBuffers(GLsizei, GLuint* b) { if (b) *b = 1; }
static inline void glGenFramebuffers(GLsizei, GLuint* b) { if (b) *b = 1; }
static inline void glGenTextures(GLsizei, GLuint* b) { if (b) *b = 1; }
static inline void glGetIntegerv(GLenum, GLint* v) { if (v) v[0] = v[1] = v[2] = v[3] = 0; }
static inline GLboolean glIsBuffer(GLuint) { return GL_FALSE; }
static inline void glLightModeli(GLenum, GLint) {}
static inline void glLightfv(GLenum, GLenum, const GLfloat*) {}
static inline void glLineWidth(GLfloat) {}
static inline void glLoadIdentity(void) {}
static inline void glMaterialf(GLenum, GLenum, GLfloat) {}
static inline void glMaterialfv(GLenum, GLenum, const GLfloat*) {}
static inline void glMatrixMode(GLenum) {}
static inline void glNormalPointer(GLenum, GLsizei, const void*) {}
static inline void glOrtho(GLdouble, GLdouble, GLdouble, GLdouble, GLdouble, GLdouble) {}
static inline void glPolygonMode(GLenum, GLenum) {}
static inline void glPopMatrix(void) {}
static inline void glPushMatrix(void) {}
static inline void glRasterPos2f(GLfloat, GLfloat) {}
static inline void glReadBuffer(GLenum) {}
static inline void glReadPixels(GLint, GLint, GLsizei, GLsizei, GLenum, GLenum, void*) {}
static inline void glTexCoordPointer(GLint, GLenum, GLsizei, const void*) {}
static inline void glTexEnvi(GLenum, GLenum, GLint) {}
static inline void glTexImage2D(GLenum, GLint, GLint, GLsizei, GLsizei, GLint, GLenum, GLenum, const void*) {}
static inline void glTexParameteri(GLenum, GLenum, GLint) {}
static inline void glTexStorage2D(GLenum, GLsizei, GLenum, GLsizei, GLsizei) {}
static inline void glTranslatef(GLfloat, GLfloat, GLfloat) {}
static inline void glVertex2f(GLfloat, GLfloat) {}
static inline void glVertex3f(GLfloat, GLfloat, GLfloat) {}
static inline void glVertexPointer(GLint, GLenum, GLsizei, const void*) {}
static inline void glViewport(GLint, GLint, GLsizei, GLsizei) {}
static inline void gluLookAt(GLdouble, GLdouble, GLdouble, GLdouble, GLdouble,
                             GLdouble, GLdouble, GLdouble, GLdouble) {}
static inline GLenum glewInit(void) { return GLEW_OK; }

#endif
